"""IvfIndex: balanced IVF-flat ANN (TPU-native addition; no reference
analogue — the reference's only ANN engine is HNSW). Quality gates
follow the reference test pattern: brute-force ground truth + recall
thresholds (``test/test_hnsw_algo.c:10-34`` role)."""

import numpy as np
import pytest

from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.index.ivf import IvfIndex, _balanced_assign, _ranks_within


def _clustered(rng, n, d, n_centers=40, q=200):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    x = centers[rng.integers(0, n_centers, n)]
    x = x + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qq = x[rng.integers(0, n, q)]
    qq = qq + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    qq /= np.linalg.norm(qq, axis=1, keepdims=True)
    return x, qq


def _recall(ids, true_ids):
    ids = np.asarray(ids)
    return sum(
        len(set(a[a >= 0]) & set(b[b >= 0])) for a, b in zip(ids, true_ids)
    ) / true_ids.size


@pytest.fixture(scope="module")
def built(module_rng):
    rng = module_rng
    x, q = _clustered(rng, 6000, 64)
    flat = FlatIndex(64, "cosine")
    flat.insert(np.arange(6000), x)
    true_ids, true_d = flat.search(q, k=10)
    idx = IvfIndex(64, "cosine", cluster_size=64, nprobe=8, rescore_r=32)
    idx.insert(np.arange(6000), x)
    return x, q, flat, true_ids, true_d, idx


@pytest.fixture(scope="module")
def module_rng():
    return np.random.default_rng(3)


def test_bulk_build_recall(built):
    x, q, flat, true_ids, true_d, idx = built
    assert idx.centroids is not None  # bulk insert triggers the build
    assert idx.nlist >= 6000 // 64
    ids, d = idx.search(q, k=10)
    assert _recall(ids, true_ids) >= 0.9
    # wider probing improves (or holds) recall — the ef_search analogue
    ids16, _ = idx.search(q, k=10, nprobe=16)
    assert _recall(ids16, true_ids) >= _recall(ids, true_ids) - 0.02


def test_exact_rescored_distances(built):
    """Returned distances are exact f32 (two-tier contract): wherever
    IVF finds the true nearest neighbor, its distance matches the
    exact engine's to float tolerance."""
    x, q, flat, true_ids, true_d, idx = built
    ids, d = idx.search(q, k=10)
    hits = 0
    for a, da, b, db in zip(ids, d, true_ids, true_d):
        if a[0] == b[0]:
            assert abs(da[0] - db[0]) < 1e-4
            hits += 1
    assert hits > len(q) * 0.8


def test_single_query_and_self_hit(built):
    x, q, flat, true_ids, true_d, idx = built
    ids, d = idx.search(x[17], k=5)
    assert ids.shape == (5,)
    assert ids[0] == 17 and d[0] < 1e-5


def test_incremental_insert_and_pending(module_rng, built):
    x, q, flat, true_ids, true_d, _ = built
    rng = module_rng
    idx = IvfIndex(64, "cosine", cluster_size=64, nprobe=8)
    idx.insert(np.arange(6000), x)
    extra = x[:300] + 0.01 * rng.standard_normal((300, 64)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    idx.insert(np.arange(6000, 6300), extra)
    # new rows are findable immediately (cluster slot or pending region)
    ids, _ = idx.search(extra[7], k=3)
    assert 6007 in ids


def test_delete_and_rebuild(module_rng):
    rng = np.random.default_rng(11)
    x, q = _clustered(rng, 3000, 32)
    idx = IvfIndex(32, "cosine", cluster_size=64, nprobe=8)
    idx.insert(np.arange(3000), x)
    flat = FlatIndex(32, "cosine")
    flat.insert(np.arange(3000), x)
    true_ids, _ = flat.search(q, k=10)
    victims = np.unique(true_ids[:, 0])[:30].astype(np.int64)
    idx.delete(victims)
    ids, _ = idx.search(q, k=10)
    assert not (set(np.asarray(ids).ravel().tolist()) & set(victims.tolist()))
    # rebuild repacks live rows; recall vs live ground truth holds
    idx.rebuild()
    flat.delete(victims)
    t2, _ = flat.search(q, k=10)
    ids2, _ = idx.search(q, k=10)
    assert _recall(ids2, t2) >= 0.9


@pytest.mark.parametrize("metric", ["l2", "inner_product"])
def test_other_metrics(metric, module_rng):
    rng = np.random.default_rng(7)
    x, q = _clustered(rng, 3000, 32)
    flat = FlatIndex(32, metric)
    flat.insert(np.arange(3000), x)
    t, _ = flat.search(q, k=10)
    idx = IvfIndex(32, metric, cluster_size=64, nprobe=10)
    idx.insert(np.arange(3000), x)
    ids, _ = idx.search(q, k=10)
    assert _recall(ids, t) >= 0.85


def test_unbuilt_exact_fallback(module_rng):
    rng = np.random.default_rng(5)
    x, _ = _clustered(rng, 50, 32)
    idx = IvfIndex(32, "cosine", cluster_size=64)
    idx.insert(np.arange(50), x)
    assert idx.centroids is None  # below the build threshold
    ids, d = idx.search(x[3], k=5)
    assert ids[0] == 3
    # empty index
    empty = IvfIndex(32, "cosine")
    ei, ed = empty.search(x[:2], k=3)
    assert (np.asarray(ei) == -1).all()


def test_balanced_assign_capacity():
    """Every cluster ends at <= S members; nearest-first greedy places
    closer rows first; leftovers spill to clusters with space."""
    rng = np.random.default_rng(0)
    n, ncl, s = 500, 4, 130
    top_cl = np.tile(np.argsort(rng.standard_normal((n, 4)), axis=1), 1)
    top_d = np.sort(rng.standard_normal((n, 4)).astype(np.float32), axis=1)
    fill = np.zeros(ncl, np.int64)
    assigned = _balanced_assign(top_cl.astype(np.int32), top_d, fill, s)
    assert (assigned >= 0).all()  # 4*130 >= 500: everyone fits
    counts = np.bincount(assigned, minlength=ncl)
    assert (counts <= s).all()
    assert counts.sum() == n
    # ranks are dense within each cluster starting at base
    ranks = _ranks_within(assigned, np.zeros(ncl, np.int64))
    for c in range(ncl):
        r = np.sort(ranks[assigned == c])
        assert (r == np.arange(r.size)).all()


def test_serve_ivf_kind(module_rng):
    """The engine server exposes kind='ivf' with nprobe pass-through."""
    from muninn_tpu.client import EngineClient
    from muninn_tpu.serve import EngineServer

    rng = np.random.default_rng(2)
    x, _ = _clustered(rng, 2200, 32)
    srv = EngineServer()
    port = srv.start(port=0)
    try:
        c = EngineClient(f"http://127.0.0.1:{port}", retries=1, backoff=0.01)
        h = c.create_index("iv", 32, metric="cosine", kind="ivf",
                           cluster_size=64, nprobe=6)
        h.insert(np.arange(2200), x)
        ids, d = h.search(x[5], k=3, nprobe=12)
        assert ids[0] == 5
    finally:
        srv.stop()


def test_int8_blocks_recall_and_churn(module_rng):
    """quant='int8' blocks: recall matches bf16 within the rescore
    contract, incremental inserts quantize in place, deletes mask."""
    rng = np.random.default_rng(11)
    x, q = _clustered(rng, 5000, 64)
    flat = FlatIndex(64, "cosine")
    flat.insert(np.arange(5000), x)
    true_ids, _ = flat.search(q, k=10)

    idx = IvfIndex(64, "cosine", cluster_size=64, nprobe=8,
                   rescore_r=32, quant="int8")
    idx.insert(np.arange(5000), x)
    idx.rebuild()
    assert idx.blocks.dtype == np.int8
    assert idx.block_scales is not None
    ids, d = idx.search(q, k=10)
    assert _recall(ids, np.asarray(true_ids)) > 0.93
    assert np.all(np.diff(np.asarray(d), axis=1) >= -1e-6)

    # churn: incremental insert writes int8 rows + scales in place
    new = rng.standard_normal((8, 64)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    idx.insert(np.arange(9000, 9008), new)
    ids2, _ = idx.search(new, k=1)
    assert [int(i[0]) for i in np.asarray(ids2).reshape(8, 1)] == list(
        range(9000, 9008)
    )
    idx.delete([9000])
    ids3, _ = idx.search(new[:1], k=1)
    assert int(np.asarray(ids3)[0, 0]) != 9000


def test_int8_checkpoint_roundtrip(module_rng, tmp_path):
    from muninn_tpu.io.checkpoint import load_ivf, save_ivf

    rng = np.random.default_rng(12)
    x, q = _clustered(rng, 2000, 32)
    idx = IvfIndex(32, "cosine", cluster_size=32, nprobe=6, quant="int8")
    idx.insert(np.arange(2000), x)
    idx.rebuild()
    want_ids, want_d = idx.search(q[:16], k=5)
    save_ivf(idx, tmp_path / "i8")
    idx2 = load_ivf(tmp_path / "i8")
    assert idx2.quant == "int8" and idx2.blocks.dtype == np.int8
    got_ids, got_d = idx2.search(q[:16], k=5)
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)


def test_int8_sharded_matches_one_shard(module_rng):
    from muninn_tpu.parallel import make_mesh, shard_ivf

    rng = np.random.default_rng(13)
    x, q = _clustered(rng, 1600, 32)
    idx = IvfIndex(32, "cosine", cluster_size=32, nprobe=8, quant="int8")
    idx.insert(np.arange(1600), x)
    idx.rebuild()
    d8, i8 = shard_ivf(idx, make_mesh())(q[:16], k=5)
    d1, i1 = shard_ivf(idx, make_mesh(1))(q[:16], k=5)
    np.testing.assert_array_equal(np.asarray(i8), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d1), rtol=1e-4)


def test_ivf_randomized_churn_differential(tmp_path):
    """Property soak representative (25-trial campaign ran clean):
    interleaved insert/delete waves vs a live-set flat oracle — no
    ghost ids, near-exact recall probing all clusters, and a mid-churn
    checkpoint round-trips to identical results."""
    from muninn_tpu.io.checkpoint import load_ivf, save_ivf

    rng = np.random.default_rng(23)
    for trial, quant in [(0, "bf16"), (1, "int8")]:
        dim, metric = 16, "cosine"
        idx = IvfIndex(dim, metric, cluster_size=64, seed=trial, quant=quant)
        live, nid = {}, 0
        v0 = rng.standard_normal((600, dim)).astype(np.float32)
        idx.insert(np.arange(600), v0)
        live.update(zip(range(600), v0))
        nid = 600
        for phase in range(3):
            n_ins = int(rng.integers(40, 120))
            v = rng.standard_normal((n_ins, dim)).astype(np.float32)
            ids = np.arange(nid, nid + n_ins)
            nid += n_ins
            idx.insert(ids, v)
            live.update(zip(ids.tolist(), v))
            if phase:
                kill = rng.choice(sorted(live), size=50, replace=False)
                idx.delete(kill)
                for i in kill.tolist():
                    del live[i]
        keys = np.array(sorted(live))
        mat = np.stack([live[i] for i in keys.tolist()])
        flat = FlatIndex(dim, metric, use_pallas=False, capacity=1024)
        flat.insert(keys, mat)
        q = mat[rng.choice(len(keys), 25, replace=False)] + \
            0.03 * rng.standard_normal((25, dim)).astype(np.float32)
        got, _ = idx.search(q, k=5, nprobe=idx.nlist)
        want, _ = flat.search(q, k=5)
        assert set(got[got >= 0].tolist()) <= set(keys.tolist())
        hits = sum(len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
                   for a, b in zip(got, want))
        assert hits / (25 * 5) >= 0.9
        save_ivf(idx, tmp_path / f"ck{trial}")
        idx2 = load_ivf(tmp_path / f"ck{trial}")
        g2, _ = idx2.search(q, k=5, nprobe=idx2.nlist)
        assert np.array_equal(got, g2)


def test_bf16_store_mode(module_rng):
    """store_dtype=bfloat16 halves the store; the rescore runs against
    bf16 rows — recall must match the f32-store build within noise
    (the big-N HBM mode used by tools/probes/scale_4m_ivf_probe.py)."""
    import jax.numpy as jnp

    rng = module_rng
    x, q = _clustered(rng, 4000, 48)
    flat = FlatIndex(48, "cosine")
    flat.insert(np.arange(4000), x)
    true_ids, _ = flat.search(q, k=10)

    recalls = {}
    for dt in (jnp.float32, jnp.bfloat16):
        idx = IvfIndex(48, "cosine", cluster_size=64, nprobe=8,
                       rescore_r=32, seed=1, store_dtype=dt)
        idx.insert(np.arange(4000), x)
        ids, dists = idx.search(q, k=10)
        recalls[dt.__name__] = _recall(ids, true_ids)
        assert np.asarray(dists).dtype == np.float32  # outputs stay f32
        # churn works through the bf16 store too
        idx.insert(np.arange(4000, 4032), x[:32])
        idx.delete(np.arange(16))
        ids2, _ = idx.search(q[:8], k=5)
        assert not set(ids2[ids2 >= 0].tolist()) & set(range(16))
        # checkpoint identity (bf16 stores round-trip via uint16 views)
        import tempfile

        from muninn_tpu.io.checkpoint import load_ivf, save_ivf

        with tempfile.TemporaryDirectory() as d:
            save_ivf(idx, d)
            idx3 = load_ivf(d)
            assert idx3.store.vectors.dtype == dt
            a, _ = idx.search(q[:8], k=5)
            b, _ = idx3.search(q[:8], k=5)
            np.testing.assert_array_equal(a, b)
    assert recalls["bfloat16"] >= recalls["float32"] - 0.02, recalls


def test_large_query_batch_chunks_internally(module_rng):
    """Regression (round-5 ER at scale): a query batch past the chunk
    size must not materialize the [B, p*s, d] gather in one piece (a
    99k-query batch at d=96 was a 78 GB AOT allocation on chip). The
    engine chunks internally; results must equal per-row searches."""
    rng = module_rng
    d, n = 24, 900
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = IvfIndex(d, "cosine", cluster_size=32, nprobe=4, seed=0)
    idx.insert(np.arange(n), x)
    idx.rebuild()
    big = np.repeat(x[:130], 65, axis=0)        # 8450 > the 8192 chunk
    ids, dists = idx.search(big, k=3)
    assert ids.shape == (8450, 3)
    # rows across the chunk boundary match the same query's small-batch
    # result (self-hit first, identical neighbor sets)
    ref_ids, ref_d = idx.search(x[:130], k=3)
    for probe_row in (0, 8191, 8192, 8449):
        src = probe_row // 65
        np.testing.assert_array_equal(ids[probe_row], ref_ids[src])
        np.testing.assert_allclose(dists[probe_row], ref_d[src], rtol=1e-5)
