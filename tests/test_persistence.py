"""Checkpoint/resume + GraphCache delta lifecycle (the reference's
shadow-table persistence tests: pytests/test_hnsw_vtab.py,
pytests/test_graph_adjacency.py)."""

import numpy as np
import pytest

from muninn_tpu.index.hnsw import HnswIndex
from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.io.checkpoint import (
    DeltaLog,
    load_flat,
    load_hnsw,
    save_flat,
    save_hnsw,
)
from muninn_tpu.graph.adjacency import GraphCache


def test_hnsw_save_load_roundtrip(rng, tmp_path):
    vecs = rng.standard_normal((300, 24)).astype(np.float32)
    idx = HnswIndex(24, "cosine", m=8, ef_construction=60, wave_size=100, seed=7)
    idx.insert(np.arange(300), vecs)
    idx.delete([5, 6, 7])
    q = rng.standard_normal((20, 24)).astype(np.float32)
    want_ids, want_d = idx.search(q, k=5, ef_search=40)

    save_hnsw(idx, tmp_path / "ck")
    idx2 = load_hnsw(tmp_path / "ck")
    got_ids, got_d = idx2.search(q, k=5, ef_search=40)
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-6)
    # loaded index remains mutable
    idx2.insert([1000], rng.standard_normal((1, 24)).astype(np.float32))
    assert len(idx2) == 298


def test_flat_save_load_roundtrip(rng, tmp_path):
    idx = FlatIndex(16, "l2", use_pallas=False)
    idx.insert(np.arange(50), rng.standard_normal((50, 16)).astype(np.float32))
    idx.delete([3])
    q = rng.standard_normal((5, 16)).astype(np.float32)
    want_ids, _ = idx.search(q, k=3)
    save_flat(idx, tmp_path / "fk")
    idx2 = load_flat(tmp_path / "fk")
    idx2.use_pallas = False
    got_ids, _ = idx2.search(q, k=3)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_quantized_save_load_roundtrip(rng, tmp_path):
    from muninn_tpu.index.flat import QuantizedFlatIndex
    from muninn_tpu.io.checkpoint import load_quantized, save_quantized

    idx = QuantizedFlatIndex(16, "cosine")
    idx.insert(np.arange(60), rng.standard_normal((60, 16)).astype(np.float32))
    idx.delete([5, 7])
    q = rng.standard_normal((5, 16)).astype(np.float32)
    want_ids, want_d = idx.search(q, k=3)
    save_quantized(idx, tmp_path / "qk")
    idx2 = load_quantized(tmp_path / "qk")
    got_ids, got_d = idx2.search(q, k=3)
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-6)
    # churn after load keeps working (store maps restored)
    idx2.insert([200], rng.standard_normal((1, 16)).astype(np.float32))
    idx2.delete([0])
    ids3, _ = idx2.search(q, k=3)
    assert 0 not in set(ids3.reshape(-1).tolist())


def test_kind_mismatch_raises(rng, tmp_path):
    idx = FlatIndex(8, "l2", use_pallas=False)
    idx.insert([1], np.zeros((1, 8), np.float32))
    save_flat(idx, tmp_path / "x")
    with pytest.raises(ValueError):
        load_hnsw(tmp_path / "x")


def test_graph_cache_lazy_freshness(rng):
    gc = GraphCache.from_edges(["a", "b"], ["b", "c"])
    gen0 = gc.generation
    g = gc.graph()
    assert {n for n, _, _ in g.bfs("a")} == {"a", "b", "c"}
    # mutation queues a delta; read refreshes lazily
    gc.add_edges(["c"], ["d"])
    assert gc.delta_count == 1
    g2 = gc.graph()
    assert gc.delta_count == 0
    assert gc.generation > gen0
    assert {n for n, _, _ in g2.bfs("a")} == {"a", "b", "c", "d"}


def test_graph_cache_delete_edges(rng):
    gc = GraphCache.from_edges(["a", "b", "c"], ["b", "c", "d"])
    gc.remove_edges(["b"], ["c"])
    g = gc.graph()
    assert {n for n, _, _ in g.bfs("a")} == {"a", "b"}
    assert gc.num_edges == 2


def test_graph_cache_incremental_patches_device_csr(rng):
    """incremental_rebuild applies a mixed delta to the device-resident
    CSRs in place (core.csr_delta_device) and the result is
    bit-identical to a from-scratch build of the post-delta COO — the
    TPU-native form of the reference's affected-block rewrite
    (src/graph_adjacency.c:649-1005)."""
    from muninn_tpu import Graph

    V, E = 150, 900
    src = rng.integers(0, V, E)
    dst = rng.integers(0, V, E)
    w = rng.random(E).astype(np.float32)
    gc = GraphCache.from_edges(src.tolist(), dst.tolist(), w)
    g = gc.graph()
    # materialize the device CSRs (small graphs route analytics to
    # the host fast path, so materialize explicitly)
    g.csr("forward"); g.csr("reverse"); g.csr("both")

    gc.add_edges(
        rng.integers(0, V, 50).tolist(), rng.integers(0, V, 50).tolist(),
        rng.random(50).astype(np.float32),
    )
    di = rng.choice(E, 30, replace=False)
    gc.remove_edges(src[di].tolist(), dst[di].tolist())
    gc.remove_edges([int(src[0])], [int(dst[0])])
    gc.add_edges([int(src[0])], [int(dst[0])], [9.0])  # delete-then-re-add
    gc.incremental_rebuild()
    g2 = gc.graph()
    assert g2 is g, "incremental keeps the live graph object"

    ref = Graph(gc.nodes, gc._src.copy(), gc._dst.copy(), gc._w.copy())
    ref.__class__ = type(g)
    for direction in ("forward", "reverse", "both"):
        ca, cb = g2.csr(direction), ref.csr(direction)
        assert ca.e_valid == cb.e_valid
        np.testing.assert_array_equal(
            np.asarray(ca.offsets), np.asarray(cb.offsets)
        )
        e = ca.e_valid
        np.testing.assert_array_equal(
            np.asarray(ca.src[:e]), np.asarray(cb.src[:e])
        )
        np.testing.assert_array_equal(
            np.asarray(ca.dst[:e]), np.asarray(cb.dst[:e])
        )
        np.testing.assert_allclose(
            np.asarray(ca.weights[:e]), np.asarray(cb.weights[:e])
        )

    pr, pr_ref = g2.pagerank(), ref.pagerank()
    for k in pr:
        assert abs(pr[k] - pr_ref[k]) < 1e-6

    # a delta that adds a new node falls back to full rebuild
    gc.add_edges(["fresh-node"], [int(src[1])])
    gc.incremental_rebuild()
    assert gc.num_nodes == V + 1
    assert gc.graph().num_nodes == V + 1


def test_graph_cache_in_order_delta_replay(rng):
    """Deltas replay sequentially: delete-then-re-add in one pending
    batch keeps the edge, and one delete removes only one of two
    parallel duplicate edges (reference graph_csr.c:219-247)."""
    gc = GraphCache.from_edges(["a", "a"], ["b", "b"])  # duplicate edge
    gc.remove_edges(["a"], ["b"])
    assert gc.graph() is not None
    assert gc.num_edges == 1  # one duplicate survives

    gc.remove_edges(["a"], ["b"])
    gc.add_edges(["a"], ["b"])
    gc.graph()
    assert gc.num_edges == 1  # delete-then-re-add keeps the edge

    gc.add_edges(["x"], ["y"])
    gc.remove_edges(["x"], ["y"])
    gc.graph()
    assert gc.num_edges == 1  # same-batch insert+delete cancels


def test_graph_cache_degrees(rng):
    gc = GraphCache.from_edges(
        ["a", "a", "b"], ["b", "c", "c"], weights=[2.0, 3.0, 4.0]
    )
    deg = gc.degrees()
    # (in, out, w_in, w_out)
    assert deg["a"] == (0, 2, 0.0, 5.0)
    assert deg["c"] == (2, 0, 7.0, 0.0)


def test_graph_cache_save_load_with_delta_log(rng, tmp_path):
    log = tmp_path / "delta.jsonl"
    gc = GraphCache.from_edges(["a"], ["b"], log_path=str(log))
    gc.save(tmp_path / "gc")          # clears the log
    gc.add_edges(["b"], ["c"])        # post-checkpoint mutation -> log
    assert len(DeltaLog(log)) == 1

    gc2 = GraphCache.load(tmp_path / "gc", log_path=str(log))
    g = gc2.graph()
    assert {n for n, _, _ in g.bfs("a")} == {"a", "b", "c"}


def test_graph_cache_explicit_rebuild_commands(rng):
    gc = GraphCache.from_edges(["a"], ["b"])
    gc.add_edges(["b"], ["c"])
    gc.incremental_rebuild()
    assert gc.delta_count == 0
    gc.add_edges(["c"], ["d"])
    gc.rebuild()
    assert gc.num_edges == 3


def test_hnsw_checkpoint_after_churn(rng, tmp_path):
    """Save/load must survive insert+delete churn, preserving the
    routing pool and repair state."""
    vecs = rng.standard_normal((400, 16)).astype(np.float32)
    idx = HnswIndex(16, "l2", m=8, ef_construction=40, wave_size=100, seed=11)
    idx.insert(np.arange(400), vecs)
    idx.delete(np.arange(0, 80))
    idx.insert(np.arange(1000, 1050), rng.standard_normal((50, 16)).astype(np.float32))
    q = rng.standard_normal((10, 16)).astype(np.float32)
    want_ids, _ = idx.search(q, k=5, ef_search=32)

    save_hnsw(idx, tmp_path / "churn")
    idx2 = load_hnsw(tmp_path / "churn")
    got_ids, _ = idx2.search(q, k=5, ef_search=32)
    np.testing.assert_array_equal(got_ids, want_ids)
    # deleted ids never reappear post-load
    assert not np.isin(got_ids[got_ids >= 0], np.arange(80)).any()
    # loaded index mutates further
    idx2.delete([100])
    ids3, _ = idx2.search(q, k=5, ef_search=32)
    assert 100 not in ids3


def test_graph_cache_incremental_threshold_boundary(rng):
    # delta <= max(10, E/10) -> incremental; more -> full rebuild.
    # Both paths must converge to the same edge set.
    gc = GraphCache.from_edges([f"n{i}" for i in range(200)],
                               [f"n{i+1}" for i in range(200)])
    gen0 = gc.generation
    gc.add_edges(["n0"] * 10, [f"m{i}" for i in range(10)])   # == threshold min
    g = gc.graph()
    assert gc.generation == gen0 + 1
    assert gc.num_edges == 210
    gc.add_edges(["n1"] * 50, [f"q{i}" for i in range(50)])   # > E/10 -> full
    g = gc.graph()
    assert gc.num_edges == 260


def test_graph_cache_block_granular_save(rng, tmp_path):
    """save() rewrites only dirty blocks: a small delta after a big save
    must not touch clean block files (the reference's 4096-node-block
    rewrite granularity, src/graph_csr.c:341-478)."""
    import os
    import time

    V, E = 500, 40_000
    src = rng.integers(0, V, E)
    dst = rng.integers(0, V, E)
    gc = GraphCache.from_edges(src.tolist(), dst.tolist())
    gc.BLOCK_EDGES  # class attr sanity
    # shrink blocks for the test so multiple blocks exist
    gc_blocks = 4096
    old_block = GraphCache.BLOCK_EDGES
    GraphCache.BLOCK_EDGES = gc_blocks
    try:
        d = tmp_path / "ck"
        gc.save(d)
        files = sorted(d.glob("block_*.npz"))
        assert len(files) == -(-E // gc_blocks)
        mtimes0 = {f.name: f.stat().st_mtime_ns for f in files}
        time.sleep(0.01)

        # small mixed delta: delete 3 edges from block 0, insert 5
        gc.remove_edges(src[:3].tolist(), dst[:3].tolist())
        gc.add_edges(
            rng.integers(0, V, 5).tolist(), rng.integers(0, V, 5).tolist()
        )
        gc.rebuild()
        gc.save(d)
        files1 = sorted(d.glob("block_*.npz"))
        changed = [
            f.name for f in files1
            if mtimes0.get(f.name) != f.stat().st_mtime_ns
        ]
        # only the deletion-owning block(s) + the tail block rewrite
        assert len(changed) <= 3, changed
        assert f"block_{len(files) - 1:05d}.npz" in changed

        # round trip equals the live arrays
        gc2 = GraphCache.load(d)
        np.testing.assert_array_equal(gc2._src, gc._src)
        np.testing.assert_array_equal(gc2._dst, gc._dst)
        np.testing.assert_array_equal(gc2._w, gc._w)
        assert gc2.nodes.ids == gc.nodes.ids
        # incremental save continues to work from the loaded instance
        gc2.add_edges([0], [1])
        gc2.rebuild()
        gc2.save(d)
        gc3 = GraphCache.load(d)
        np.testing.assert_array_equal(gc3._src, gc2._src)
    finally:
        GraphCache.BLOCK_EDGES = old_block


def test_graph_cache_save_load_unweighted_roundtrip_blocks(tmp_path):
    gc = GraphCache.from_edges(["a", "b", "c"], ["b", "c", "a"])
    gc.save(tmp_path / "g")
    gc2 = GraphCache.load(tmp_path / "g")
    assert gc2.num_edges == 3
    assert gc2.graph().bfs("a") == gc.graph().bfs("a")


def test_graph_cache_incremental_fast_path_matches_replay(rng):
    """The mirror-driven delete fast path (no O(E) replay scan) is
    bit-identical to sequential replay across randomized mixed
    batches, including duplicate edges and delete-then-re-add."""
    V, E = 80, 400
    src = rng.integers(0, V, E)
    dst = rng.integers(0, V, E)
    w = rng.random(E).astype(np.float32)
    gc1 = GraphCache.from_edges(src.tolist(), dst.tolist(), w)
    gc2 = GraphCache.from_edges(src.tolist(), dst.tolist(), w)
    g1 = gc1.graph()
    g1.csr("forward"); g1.csr("reverse")  # materialize -> incremental path
    for batch in range(3):
        for _ in range(30):
            if rng.random() < 0.5:
                i = rng.integers(0, E)
                a, b = int(src[i]), int(dst[i])
                gc1.remove_edges([a], [b]); gc2.remove_edges([a], [b])
            else:
                a, b = int(rng.integers(0, V)), int(rng.integers(0, V))
                ww = float(rng.random())
                gc1.add_edges([a], [b], [ww]); gc2.add_edges([a], [b], [ww])
        gc1.incremental_rebuild()
        gc2.rebuild()
        np.testing.assert_array_equal(gc1._src, gc2._src)
        np.testing.assert_array_equal(gc1._dst, gc2._dst)
        np.testing.assert_allclose(gc1._w, gc2._w)


def test_ivf_save_load_roundtrip(rng, tmp_path):
    from muninn_tpu.index.ivf import IvfIndex
    from muninn_tpu.io.checkpoint import load_ivf, save_ivf

    centers = rng.standard_normal((20, 32)).astype(np.float32) * 3
    vecs = (centers[rng.integers(0, 20, 600)]
            + rng.standard_normal((600, 32)).astype(np.float32))
    idx = IvfIndex(32, "cosine", cluster_size=16, nprobe=6, seed=3)
    idx.insert(np.arange(600), vecs)
    idx.rebuild()
    idx.delete([10, 11])
    # small insert lands in the pending region (exercises its save path)
    idx.insert([7000], rng.standard_normal((1, 32)).astype(np.float32))
    q = (centers[rng.integers(0, 20, 12)]
         + rng.standard_normal((12, 32)).astype(np.float32))
    want_ids, want_d = idx.search(q, k=5)

    save_ivf(idx, tmp_path / "ivf")
    idx2 = load_ivf(tmp_path / "ivf")
    got_ids, got_d = idx2.search(q, k=5)
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)
    # loaded index remains mutable, both regions intact
    idx2.insert([8000], rng.standard_normal((1, 32)).astype(np.float32))
    assert len(idx2) == len(idx) + 1
    i3, _ = idx2.search(q, k=5)
    assert (np.asarray(i3) >= 0).all()


def test_ivf_save_load_unbuilt(rng, tmp_path):
    from muninn_tpu.index.ivf import IvfIndex
    from muninn_tpu.io.checkpoint import load_ivf, save_ivf

    idx = IvfIndex(8, "l2")
    idx.insert(np.arange(30), rng.standard_normal((30, 8)).astype(np.float32))
    # never rebuilt: exact-scan fallback state must round-trip too
    q = rng.standard_normal((4, 8)).astype(np.float32)
    want_ids, _ = idx.search(q, k=3)
    save_ivf(idx, tmp_path / "u")
    idx2 = load_ivf(tmp_path / "u")
    got_ids, _ = idx2.search(q, k=3)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_flat_checkpoint_preserves_precision_mode(rng, tmp_path):
    """A rescored-mode FlatIndex must come back in the same mode (the
    manifest persists precision/proj_dim/rescore_r; shadows rebuild
    lazily) — a silent revert to 'highest' would change the engine's
    cost/recall profile under the caller."""
    from muninn_tpu.index.flat import FlatIndex
    from muninn_tpu.io.checkpoint import load_flat, save_flat

    n, d = 300, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = FlatIndex(d, "cosine", precision="proj_rescored", proj_dim=24)
    idx.insert(np.arange(n), x)
    idx.rescore_r = 48
    ids0, d0 = idx.search(x[:8], k=5)

    save_flat(idx, tmp_path / "flat")
    back = load_flat(tmp_path / "flat")
    assert back.precision == "proj_rescored"
    assert back.proj_dim == 24 and back.rescore_r == 48
    ids1, d1 = back.search(x[:8], k=5)
    np.testing.assert_array_equal(ids1, ids0)
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-6)


def test_delta_log_tolerates_torn_tail(tmp_path):
    """A crash mid-append leaves a truncated final JSONL line; replay
    must recover every acknowledged record and skip only the torn one.
    Corruption ANYWHERE else still raises."""
    import json

    import pytest

    from muninn_tpu.io.checkpoint import DeltaLog

    log = DeltaLog(tmp_path / "delta.jsonl")
    log.append("insert", id=1)
    log.append("insert", id=2)
    with open(log.path, "a") as f:
        f.write('{"op": "ins')  # torn write, no newline
    recs = list(log.replay())
    assert [r["id"] for r in recs] == [1, 2]

    # mid-file corruption is NOT silently skipped
    lines = log.path.read_text().splitlines()
    log.path.write_text("\n".join([lines[0], '{"broken', lines[1]]) + "\n")
    with pytest.raises(json.JSONDecodeError):
        list(log.replay())


def test_checkpoint_corruption_never_silently_corrupts(rng, tmp_path):
    """Fuzz representative (60-round campaign ran clean): a corrupted
    checkpoint directory must either load to identical results or
    raise — never return an index with silently different contents.
    Guards the format against e.g. a move to CRC-less raw mmap."""
    import shutil

    from muninn_tpu.index.ivf import IvfIndex
    from muninn_tpu.io import checkpoint as ck

    dim, n = 16, 700
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    ids = np.arange(n)
    q = vecs[:8]

    builds = {
        "flat": (lambda: FlatIndex(dim, "cosine", use_pallas=False,
                                   capacity=1024),
                 ck.save_flat, ck.load_flat),
        "hnsw": (lambda: HnswIndex(dim, "cosine", m=6, ef_construction=48),
                 ck.save_hnsw, ck.load_hnsw),
        "ivf": (lambda: IvfIndex(dim, "cosine", cluster_size=64),
                ck.save_ivf, ck.load_ivf),
    }
    for kind, (mk, save, load) in builds.items():
        idx = mk()
        idx.insert(ids, vecs)
        want, _ = idx.search(q, k=5)
        ref = tmp_path / f"{kind}_ref"
        save(idx, ref)
        assert np.array_equal(want, load(ref).search(q, k=5)[0])
        files = sorted(p for p in ref.rglob("*") if p.is_file())
        for r in range(6):
            work = tmp_path / f"{kind}_w{r}"
            shutil.copytree(ref, work)
            victim = work / str(
                rng.choice([str(f.relative_to(ref)) for f in files]))
            data = victim.read_bytes()
            op = r % 3
            if op == 0:
                victim.write_bytes(data[: int(rng.integers(0, len(data)))])
            elif op == 1:
                b = bytearray(data)
                for _ in range(4):
                    b[int(rng.integers(0, len(b)))] ^= int(
                        rng.integers(1, 256))
                victim.write_bytes(bytes(b))
            else:
                victim.unlink()
            try:
                got, _ = load(work).search(q, k=5)
            except Exception:
                continue  # clean failure
            assert np.array_equal(want, got), (
                f"{kind} r={r}: silent corruption")


def test_graph_cache_nodes_crc_guards_id_flips(tmp_path):
    """nodes.jsonl has no zip CRC protecting it (unlike the block
    files): a flipped byte used to load silently with a WRONG external
    id. The manifest now carries an incrementally-maintained crc32
    (save stays O(delta)); a flip raises, incremental saves keep the
    running crc consistent, and pre-crc checkpoints still load."""
    import json as _json

    gc = GraphCache.from_edges(["alice", "bob"], ["bob", "carol"])
    p = tmp_path / "ck"
    gc.save(p)
    # incremental append keeps the running crc valid
    gc.add_edges(["dave"], ["alice"])
    gc.save(p)
    gc2 = GraphCache.load(p)
    assert gc2.nodes.id_of(3) == "dave"

    raw = bytearray((p / "nodes.jsonl").read_bytes())
    raw[2] ^= 0x08
    (p / "nodes.jsonl").write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="crc32"):
        GraphCache.load(p)

    # pre-crc checkpoint (older manifest without the key) still loads
    (p / "nodes.jsonl").write_bytes(bytes(raw))  # content now "valid" per no-crc
    m = _json.loads((p / "manifest.json").read_text())
    del m["nodes_crc32"]
    (p / "manifest.json").write_text(_json.dumps(m))
    GraphCache.load(p)  # no crc key -> compat path, no raise
