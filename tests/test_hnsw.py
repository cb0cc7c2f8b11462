"""HNSW index: recall vs brute force, insert/delete lifecycle.

Mirrors the reference's test strategy (test/test_hnsw_algo.c:10-34 —
brute-force KNN as ground truth, recall assertions on the index).
"""

import numpy as np
import pytest

from muninn_tpu.index.hnsw import HnswIndex
from muninn_tpu.index.flat import FlatIndex


def build_index(rng, n=600, dim=24, metric="l2", m=8, efc=60, wave=200, seed=7):
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HnswIndex(dim, metric, m=m, ef_construction=efc,
                    wave_size=wave, seed=seed)
    idx.insert(np.arange(n), vecs)
    return idx, vecs


def recall_at_k(idx, flat, queries, k=10, ef=None):
    got_ids, _ = idx.search(queries, k=k, ef_search=ef)
    true_ids, _ = flat.search(queries, k=k)
    hits = 0
    for g, t in zip(got_ids, true_ids):
        hits += len(set(g[g >= 0]) & set(t[t >= 0]))
    return hits / (len(queries) * k)


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_hnsw_recall_vs_brute_force(rng, metric):
    idx, vecs = build_index(rng, metric=metric)
    flat = FlatIndex(24, metric, use_pallas=False)
    flat.insert(np.arange(600), vecs)
    queries = rng.standard_normal((50, 24)).astype(np.float32)
    r = recall_at_k(idx, flat, queries, k=10, ef=64)
    assert r >= 0.90, f"recall@10 = {r}"


def test_hnsw_exact_lookup_of_inserted_vector(rng):
    idx, vecs = build_index(rng, n=300)
    ids, dists = idx.search(vecs[123], k=1, ef_search=32)
    assert ids[0] == 123
    assert dists[0] < 1e-5


def test_hnsw_delete_removes_from_results(rng):
    idx, vecs = build_index(rng, n=300)
    q = vecs[50]
    ids, _ = idx.search(q, k=5, ef_search=32)
    assert ids[0] == 50
    idx.delete([50])
    ids2, _ = idx.search(q, k=5, ef_search=32)
    assert 50 not in ids2
    assert len(idx) == 299


def test_hnsw_delete_entry_point_rescans(rng):
    idx, vecs = build_index(rng, n=200)
    ep_slot = idx.entry_point
    ep_id = int(idx.store.ids_of([ep_slot])[0])
    idx.delete([ep_id])
    assert idx.entry_point != ep_slot
    # index still searchable
    ids, _ = idx.search(vecs[3], k=1, ef_search=32)
    assert ids[0] == 3 or ids[0] >= 0


def test_hnsw_recall_after_delete_wave(rng):
    idx, vecs = build_index(rng, n=500)
    dead = np.arange(0, 100)
    idx.delete(dead)
    flat = FlatIndex(24, "l2", use_pallas=False)
    flat.insert(np.arange(100, 500), vecs[100:])
    queries = rng.standard_normal((30, 24)).astype(np.float32)
    r = recall_at_k(idx, flat, queries, k=10, ef=64)
    assert r >= 0.85, f"recall@10 after deleting 20% = {r}"
    # no deleted id ever surfaces
    ids, _ = idx.search(queries, k=10, ef_search=64)
    assert not np.isin(ids[ids >= 0], dead).any()


def test_hnsw_no_edges_to_tombstones_after_churn(rng):
    """Delete repair scrubs every stale edge, and post-delete inserts
    never select soft-deleted slots as neighbors (reference excludes
    deleted nodes from insert candidates, src/hnsw_algo.c:408-410)."""
    idx, vecs = build_index(rng, n=600, wave=128)
    idx.delete(np.arange(0, 200))
    idx.insert(
        np.arange(1000, 1100),
        rng.standard_normal((100, 24)).astype(np.float32),
    )
    nb = np.asarray(idx.neighbors0)
    valid = np.asarray(idx.store.valid)
    live = np.nonzero(valid)[0]
    refs = nb[live]
    stale = int(((refs >= 0) & ~valid[np.maximum(refs, 0)]).sum())
    assert stale == 0, f"{stale} live edges point at tombstone slots"
    # upper levels too
    hi = np.asarray(idx.hi_neighbors)
    stale_hi = int(((hi >= 0) & ~valid[np.maximum(hi, 0)]).sum())
    assert stale_hi == 0, f"{stale_hi} hi-level edges point at tombstones"


def test_prune_rows_mn_ru_tiebreak():
    """Among exactly equidistant candidates, MN-RU keeps the one
    sharing more neighbors with the candidate list
    (src/hnsw_algo.c:593-646)."""
    import jax.numpy as jnp
    from muninn_tpu.index.hnsw import _prune_rows

    cap, m_max = 8, 2
    # row 0's candidates after append: ids 1,2 (current) + 3,4 (appended),
    # all at distance 1.0 except id 1 at 0.5 -> one slot left for a tie
    # among {2, 3, 4}. Neighbor rows: node 3 shares two candidates
    # (1, 2); nodes 2 and 4 share none.
    neighbors0 = jnp.full((cap, m_max), -1, jnp.int32)
    dists0 = jnp.full((cap, m_max), jnp.inf, jnp.float32)
    neighbors0 = neighbors0.at[0].set(jnp.array([1, 2], jnp.int32))
    dists0 = dists0.at[0].set(jnp.array([0.5, 1.0], jnp.float32))
    neighbors0 = neighbors0.at[3].set(jnp.array([1, 2], jnp.int32))
    neighbors0 = neighbors0.at[2].set(jnp.array([6, 7], jnp.int32))
    neighbors0 = neighbors0.at[4].set(jnp.array([6, 7], jnp.int32))
    append_i = jnp.full((cap, m_max), -1, jnp.int32)
    append_d = jnp.full((cap, m_max), jnp.inf, jnp.float32)
    append_i = append_i.at[0].set(jnp.array([3, 4], jnp.int32))
    append_d = append_d.at[0].set(jnp.array([1.0, 1.0], jnp.float32))
    aff = jnp.array([0], jnp.int32)
    # _prune_rows donates its first two args; keep copies for call #2
    nb_copy = jnp.array(neighbors0)
    dd_copy = jnp.array(dists0)

    nb, dd = _prune_rows(
        neighbors0, dists0, append_i, append_d, aff, m_max, mn_tiebreak=True
    )
    row = np.asarray(nb[0])
    assert row[0] == 1                      # closest always first
    assert row[1] == 3, row                 # MN-RU picks the mutual-rich tie

    # distance-only prune must still respect the primary key
    nb2, _ = _prune_rows(
        nb_copy, dd_copy, append_i, append_d, aff, m_max, mn_tiebreak=False,
    )
    assert np.asarray(nb2[0])[0] == 1


def test_hnsw_incremental_insert_keeps_recall(rng):
    dim = 24
    vecs = rng.standard_normal((600, dim)).astype(np.float32)
    idx = HnswIndex(dim, "l2", m=8, ef_construction=60, wave_size=100, seed=3)
    for s in range(0, 600, 150):
        idx.insert(np.arange(s, s + 150), vecs[s : s + 150])
    flat = FlatIndex(dim, "l2", use_pallas=False)
    flat.insert(np.arange(600), vecs)
    queries = rng.standard_normal((40, dim)).astype(np.float32)
    r = recall_at_k(idx, flat, queries, k=10, ef=64)
    assert r >= 0.90, f"recall@10 incremental = {r}"


def test_hnsw_empty_index_search(rng):
    idx = HnswIndex(16, "l2")
    ids, dists = idx.search(np.zeros(16, np.float32), k=3)
    assert (ids == -1).all()
    assert np.isinf(dists).all()


def test_hnsw_ef_search_default_is_2k(rng):
    # src/hnsw_vtab.c:600-603: ef_search defaults to k*2
    idx, vecs = build_index(rng, n=200)
    ids, _ = idx.search(vecs[7], k=5)  # no explicit ef
    assert ids[0] == 7


def test_hnsw_seeded_determinism(rng):
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    q = rng.standard_normal((10, 16)).astype(np.float32)
    results = []
    for _ in range(2):
        idx = HnswIndex(16, "l2", m=8, ef_construction=40, wave_size=100, seed=99)
        idx.insert(np.arange(300), vecs)
        ids, _ = idx.search(q, k=5, ef_search=32)
        results.append(ids)
    np.testing.assert_array_equal(results[0], results[1])


def test_hnsw_invalid_args():
    with pytest.raises(ValueError):
        HnswIndex(16, "l2", m=1)
    with pytest.raises(ValueError):
        HnswIndex(16, "bogus")
    idx = HnswIndex(16, "l2")
    idx.insert([1], np.zeros((1, 16), np.float32))
    with pytest.raises(ValueError):
        idx.search(np.zeros(9), k=1)


def test_hnsw_bulk_build_path(rng):
    """Large batch into an empty index takes the exact-kNN bulk path."""
    from muninn_tpu.index.flat import FlatIndex

    n, dim = 900, 24
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HnswIndex(dim, "l2", m=8, ef_construction=60, wave_size=200, seed=3)
    idx.insert(np.arange(n), vecs)  # n >= 4*wave_size -> bulk
    flat = FlatIndex(dim, "l2", use_pallas=False)
    flat.insert(np.arange(n), vecs)
    q = rng.standard_normal((40, dim)).astype(np.float32)
    r = recall_at_k(idx, flat, q, k=10, ef=64)
    assert r >= 0.9, f"bulk recall {r}"
    # incremental waves on top of a bulk-built graph
    idx.insert(np.arange(n, n + 150), rng.standard_normal((150, dim)).astype(np.float32))
    idx.delete(np.arange(0, 30))
    ids, _ = idx.search(q, k=5, ef_search=32)
    assert not np.isin(ids[ids >= 0], np.arange(30)).any()


def test_bf16_search_path_matches_f32(rng):
    """The TPU search path (bf16 beam + Pallas routing + exact rescore)
    must agree with the f32 path: same API results at slightly-perturbed
    beam trajectories, recall parity on a clustered corpus."""
    from muninn_tpu.index.flat import FlatIndex

    n, d, k = 3000, 32, 5
    centers = rng.standard_normal((30, d)).astype(np.float32)
    data = centers[rng.integers(0, 30, n)] + 0.1 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    queries = data[rng.integers(0, n, 64)] + 0.02 * rng.standard_normal(
        (64, d)
    ).astype(np.float32)

    flat = FlatIndex(d, "cosine")
    flat.insert(np.arange(n), data)
    true_ids, _ = flat.search(queries, k=k)

    idx = HnswIndex(d, "cosine", m=8, ef_construction=64, wave_size=512)
    idx.insert(np.arange(n), data)

    def recall(ids):
        hits = sum(
            len(set(map(int, a[a >= 0])) & set(map(int, b)))
            for a, b in zip(np.asarray(ids), np.asarray(true_ids))
        )
        return hits / (len(queries) * k)

    ids32, d32 = idx.search(queries, k=k, ef_search=32)
    r32 = recall(ids32)

    idx.search_bf16 = True  # force the TPU path (interpret-mode kernel)
    ids16, d16 = idx.search(queries, k=k, ef_search=32)
    r16 = recall(ids16)
    assert r16 >= r32 - 0.02, (r16, r32)
    # rescored distances are exact f32: spot-check vs direct computation
    q0 = queries[0] / np.linalg.norm(queries[0])
    hit = int(np.asarray(ids16)[0, 0])
    v0 = data[hit] / np.linalg.norm(data[hit])
    assert np.asarray(d16)[0, 0] == pytest.approx(1.0 - float(q0 @ v0), abs=1e-5)

    # caches invalidate on mutation
    idx.delete([int(np.asarray(ids16)[0, 0])])
    ids_after, _ = idx.search(queries[:1], k=k, ef_search=32)
    assert hit not in set(np.asarray(ids_after)[0].tolist())


def test_int8_beam_guidance_matches(rng):
    """int8 beam guidance (quarter-width gathers) keeps recall within
    noise of the f32 path: the exact rescore fixes final ranking."""
    n, d, k = 2500, 32, 5
    centers = rng.standard_normal((25, d)).astype(np.float32)
    data = centers[rng.integers(0, 25, n)] + 0.1 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    queries = data[rng.integers(0, n, 48)] + 0.02 * rng.standard_normal(
        (48, d)
    ).astype(np.float32)
    from muninn_tpu.index.flat import FlatIndex

    flat = FlatIndex(d, "cosine")
    flat.insert(np.arange(n), data)
    true_ids, _ = flat.search(queries, k=k)

    idx = HnswIndex(d, "cosine", m=8, ef_construction=64, wave_size=512)
    idx.insert(np.arange(n), data)
    idx.search_bf16 = True

    def recall(ids):
        return sum(
            len(set(map(int, a[a >= 0])) & set(map(int, b)))
            for a, b in zip(np.asarray(ids), np.asarray(true_ids))
        ) / (len(queries) * k)

    r16 = recall(idx.search(queries, k=k, ef_search=32)[0])
    idx.search_quant = "int8"
    r8 = recall(idx.search(queries, k=k, ef_search=32)[0])
    assert r8 >= r16 - 0.03, (r8, r16)
    # shorter patience still searches correctly
    idx.beam_patience = 4
    r8p = recall(idx.search(queries, k=k, ef_search=32)[0])
    assert r8p >= r16 - 0.06, (r8p, r16)


def test_packed_neighbor_search_matches_row_path(rng):
    """Neighborhood materialization (packed [cap, R0, d] blocks) must
    return identical results to the row-gather beam."""
    n, d = 3000, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:64] + 0.05 * rng.standard_normal((64, d)).astype(np.float32)
    idx = HnswIndex(d, "cosine", m=8, ef_construction=64,
                    wave_size=4096, capacity=2 * n)
    idx.insert(np.arange(n), x)
    idx.exact_small_n = 0      # force the beam path at this size
    idx.search_bf16 = True     # fused path (uses packed when present)
    ids_row, d_row = idx.search(q, k=10, ef_search=32)
    idx.pack_neighbors()
    assert idx._packed is not None
    ids_pk, d_pk = idx.search(q, k=10, ef_search=32)
    np.testing.assert_array_equal(ids_pk, ids_row)
    np.testing.assert_allclose(d_pk, d_row, rtol=1e-5, atol=1e-6)
    # mutation drops the packed table (stale vectors would be wrong)
    idx.insert(np.arange(n, n + 4), x[:4])
    assert idx._packed is None


def test_fused_beam_kernel_matches_packed_path(rng):
    """The Pallas DMA gather+dots beam (fused=True) returns the same
    beam as the XLA packed path — same math, no HBM intermediate."""
    import jax.numpy as jnp
    from muninn_tpu.index.hnsw import _beam_search_level0
    from muninn_tpu.ops.distance import Metric

    n, d, r0, ef = 512, 128, 16, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    # random r0-regular neighbor table + packed blocks (f32: sublane 8)
    nbrs = rng.integers(0, n, (n, r0)).astype(np.int32)
    vecs = jnp.asarray(x)
    packed = vecs[jnp.asarray(nbrs)]
    q = jnp.asarray(
        x[:40] + 0.05 * rng.standard_normal((40, d)).astype(np.float32)
    )
    entry = jnp.asarray(rng.integers(0, n, (40, 4)).astype(np.int32))

    for metric in (Metric.COSINE, Metric.L2, Metric.INNER_PRODUCT):
        bd, bi = _beam_search_level0(
            q, entry, vecs, jnp.asarray(nbrs), metric, ef, expand=4,
            packed=packed, fused=False,
        )
        fd, fi = _beam_search_level0(
            q, entry, vecs, jnp.asarray(nbrs), metric, ef, expand=4,
            packed=packed, fused=True, interpret=True,
        )
        # identical beams up to fp-reduction-order ties: compare sets
        # and distances
        same = np.mean([
            len(set(a[a >= 0]) & set(b[b >= 0]))
            / max((a >= 0).sum(), 1)
            for a, b in zip(np.asarray(bi), np.asarray(fi))
        ])
        assert same >= 0.95, (metric, same)
        np.testing.assert_allclose(
            np.sort(np.asarray(fd), axis=1)[:, :ef // 2],
            np.sort(np.asarray(bd), axis=1)[:, :ef // 2],
            rtol=1e-4, atol=1e-5,
        )


def test_fused_beam_int8_packed_matches_row_dequant(rng):
    """int8 packed blocks + per-neighbor scale epilogue must match the
    scale-aware row-gather beam (same dequantized values, half the DMA
    bytes on TPU)."""
    import jax.numpy as jnp
    from muninn_tpu.index.hnsw import _beam_search_level0
    from muninn_tpu.ops.distance import Metric

    n, d, r0, ef = 512, 128, 32, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sc = np.abs(x).max(axis=1) / 127.0
    vi = np.clip(np.round(x / sc[:, None]), -127, 127).astype(np.int8)
    nbrs = rng.integers(0, n, (n, r0)).astype(np.int32)
    packed8 = jnp.asarray(vi)[jnp.asarray(nbrs)]           # [n, r0, d] int8
    pscales = jnp.asarray(sc.astype(np.float32))[jnp.asarray(nbrs)]
    q = jnp.asarray(
        x[:24] + 0.05 * rng.standard_normal((24, d)).astype(np.float32)
    )
    entry = jnp.asarray(rng.integers(0, n, (24, 4)).astype(np.int32))

    for metric in (Metric.COSINE, Metric.INNER_PRODUCT):
        # row path: int8 vectors + per-row dequant inside fetch()
        bd, bi = _beam_search_level0(
            q, entry, jnp.asarray(vi), jnp.asarray(nbrs), metric, ef,
            expand=4, scales=jnp.asarray(sc.astype(np.float32)),
        )
        fd, fi = _beam_search_level0(
            q, entry, jnp.asarray(vi), jnp.asarray(nbrs), metric, ef,
            expand=4, scales=jnp.asarray(sc.astype(np.float32)),
            packed=packed8, pscales=pscales, fused=True, interpret=True,
        )
        same = np.mean([
            len(set(a[a >= 0]) & set(b[b >= 0])) / max((a >= 0).sum(), 1)
            for a, b in zip(np.asarray(bi), np.asarray(fi))
        ])
        assert same >= 0.95, (metric, same)
        np.testing.assert_allclose(
            np.sort(np.asarray(fd), axis=1)[:, :ef // 2],
            np.sort(np.asarray(bd), axis=1)[:, :ef // 2],
            rtol=1e-3, atol=1e-4,
        )


def test_topm_kernel_matches_reference_math(rng):
    """gather_block_topm (interpret) == numpy epilogue + per-pick
    top-m on the same blocks, for every metric; penalty masking
    excludes candidates from the top-m."""
    import jax.numpy as jnp
    from muninn_tpu.ops.pallas_beam import gather_block_topm
    from muninn_tpu.ops.distance import Metric

    n, d, r0, e, b, m = 256, 128, 8, 3, 16, 5
    x = rng.standard_normal((n, r0, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    idx = rng.integers(0, n, (b, e)).astype(np.int32)
    pen = np.where(rng.random((b, e * r0)) < 0.25, 3.0e38, 0.0).astype(
        np.float32
    )

    blocks = x[idx]                                   # [b, e, r0, d]
    dots = np.einsum("bd,berd->ber", q, blocks)
    cn2 = np.sum(blocks * blocks, axis=3)
    qn2 = np.sum(q * q, axis=1)[:, None, None]
    want = {
        Metric.INNER_PRODUCT: -dots,
        Metric.L2: np.maximum(qn2 + cn2 - 2 * dots, 0.0),
        Metric.COSINE: 1.0 - dots / np.maximum(
            np.sqrt(qn2) * np.sqrt(cn2), 1e-30
        ),
    }
    for metric, ref in want.items():
        ref = ref + pen.reshape(b, e, r0)
        md, ml = gather_block_topm(
            jnp.asarray(q), jnp.asarray(idx), jnp.asarray(x),
            jnp.asarray(pen), metric=metric, m=m, interpret=True,
        )
        md, ml = np.asarray(md), np.asarray(ml)
        order = np.argsort(ref, axis=2, kind="stable")[:, :, :m]
        np.testing.assert_allclose(
            md, np.take_along_axis(ref, order, axis=2),
            rtol=1e-4, atol=1e-4,
        )
        # locations agree wherever distances are unique and unmasked
        ref_d = np.take_along_axis(ref, order, axis=2)
        uniq = ref_d < 1e37
        assert (ml[uniq] == order[uniq]).mean() > 0.99


def test_beam_kernels_skip_dead_picks(rng):
    """id -1 marks a dead pick (converged query / invalid slot): the
    kernel must not copy its block, live lanes must be unchanged, and
    dead lanes must carry deterministic defaults (dots/cn2 = 0;
    topm dist = +BIG at local index 0) — never uninitialized VMEM."""
    import jax.numpy as jnp
    from muninn_tpu.ops.pallas_beam import gather_block_dots, gather_block_topm
    from muninn_tpu.ops.distance import Metric

    n, d, r0, e, b = 128, 128, 8, 4, 16
    x = rng.standard_normal((n, r0, d)).astype(np.float32)
    idx = rng.integers(0, n, (b, e)).astype(np.int32)
    dead = rng.random((b, e)) < 0.4
    dead[0] = True            # a fully-dead query
    dead[1] = False           # a fully-live query
    idx_dead = np.where(dead, -1, idx).astype(np.int32)
    q = rng.standard_normal((b, d)).astype(np.float32)

    dots_all, cn2_all = gather_block_dots(
        jnp.asarray(q), jnp.asarray(idx), jnp.asarray(x), interpret=True
    )
    dots_sk, cn2_sk = gather_block_dots(
        jnp.asarray(q), jnp.asarray(idx_dead), jnp.asarray(x), interpret=True
    )
    lanes = np.repeat(dead, r0, axis=1)                       # [b, e*r0]
    np.testing.assert_allclose(
        np.asarray(dots_sk)[~lanes], np.asarray(dots_all)[~lanes],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(cn2_sk)[~lanes], np.asarray(cn2_all)[~lanes], rtol=1e-6
    )
    assert (np.asarray(dots_sk)[lanes] == 0.0).all()
    assert (np.asarray(cn2_sk)[lanes] == 0.0).all()

    m = 3
    pen = np.zeros((b, e * r0), np.float32)
    md_all, ml_all = gather_block_topm(
        jnp.asarray(q), jnp.asarray(idx), jnp.asarray(x), jnp.asarray(pen),
        metric=Metric.L2, m=m, interpret=True,
    )
    md_sk, ml_sk = gather_block_topm(
        jnp.asarray(q), jnp.asarray(idx_dead), jnp.asarray(x),
        jnp.asarray(pen), metric=Metric.L2, m=m, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(md_sk)[~dead], np.asarray(md_all)[~dead], rtol=1e-6
    )
    assert (np.asarray(ml_sk)[~dead] == np.asarray(ml_all)[~dead]).all()
    assert (np.asarray(md_sk)[dead] >= 1.0e38).all()
    assert (np.asarray(ml_sk)[dead] == 0).all()


def test_beam_topm_full_width_matches_dots_path(rng):
    """topm == R0 keeps every candidate — the beam must be identical
    to the fused dots path (same candidates, same merge)."""
    import jax.numpy as jnp
    from muninn_tpu.index.hnsw import _beam_search_level0
    from muninn_tpu.ops.distance import Metric

    n, d, r0, ef = 512, 128, 16, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    nbrs = rng.integers(0, n, (n, r0)).astype(np.int32)
    vecs = jnp.asarray(x)
    packed = vecs[jnp.asarray(nbrs)]
    q = jnp.asarray(
        x[:32] + 0.05 * rng.standard_normal((32, d)).astype(np.float32)
    )
    entry = jnp.asarray(rng.integers(0, n, (32, 4)).astype(np.int32))
    for metric in (Metric.COSINE, Metric.L2):
        bd, bi = _beam_search_level0(
            q, entry, vecs, jnp.asarray(nbrs), metric, ef, expand=4,
            packed=packed, fused=True, interpret=True,
        )
        td, ti = _beam_search_level0(
            q, entry, vecs, jnp.asarray(nbrs), metric, ef, expand=4,
            packed=packed, fused=True, interpret=True, topm=r0,
        )
        same = np.mean([
            len(set(a[a >= 0]) & set(b[b >= 0])) / max((a >= 0).sum(), 1)
            for a, b in zip(np.asarray(bi), np.asarray(ti))
        ])
        assert same > 0.97, same
        np.testing.assert_allclose(
            np.asarray(td), np.asarray(bd), rtol=1e-3, atol=1e-4
        )


def test_hnsw_beam_topm_recall(rng):
    """The full production dispatch (_search_topk_fused) with
    beam_topm keeps recall within a whisker of the full-width fused
    beam. (The public CPU path gates fused off by design — CPU tests
    keep the row-gather path exercised — so this drives the fused
    program in interpret mode like the kernel tests do.)"""
    import jax.numpy as jnp
    from muninn_tpu.index.hnsw import _search_topk_fused

    n, d, k = 3000, 128, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:64] + 0.05 * rng.standard_normal((64, d)).astype(np.float32)
    flat = FlatIndex(d, "cosine")
    flat.insert(np.arange(n), x)
    tid, _ = flat.search(q, k=k)

    idx = HnswIndex(d, "cosine", m=8, ef_construction=64,
                    wave_size=4096, capacity=2 * n)
    idx.insert(np.arange(n), x)
    idx.pack_neighbors()
    packed = idx._maybe_packed(force=True)
    assert packed is not None
    pool = idx._routing_pool()
    pv = idx._pool_vecs(pool)
    qj = jnp.asarray(q)

    def run(topm):
        d_, s_ = _search_topk_fused(
            qj, pool, pv, idx.store.vectors, idx._vecs16(),
            idx.neighbors0, idx.store.valid, idx.metric, k, 32, 4, 8,
            True,  # interpret
            None, 0, packed, True, 0, True, None, topm,
        )
        return idx.store.ids_of(np.asarray(s_))

    def recall(ids):
        return np.mean([
            len(set(a[a >= 0]) & set(b[b >= 0])) / k
            for a, b in zip(ids, tid)
        ])

    r_full = recall(run(0))
    r_topm = recall(run(8))
    assert r_topm >= r_full - 0.02, (r_full, r_topm)
    assert r_full > 0.7


def test_search_degree_slices_cached_and_consistent(rng):
    """search_degree slices the neighbor/packed tables once and caches
    them (re-slicing the multi-GB packed table per call would copy it
    on device every search); the cache invalidates when the knob or the
    source tables change."""
    n, d = 3000, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:32] + 0.05 * rng.standard_normal((32, d)).astype(np.float32)
    idx = HnswIndex(d, "cosine", m=8, ef_construction=64,
                    wave_size=4096, capacity=2 * n)
    idx.insert(np.arange(n), x)
    idx.exact_small_n = 0
    idx.search_bf16 = True     # production fused path (honors the knobs)
    idx.pack_neighbors()
    idx.search_degree = 8
    ids1, _ = idx.search(q, k=10, ef_search=32)
    cache1 = idx._sd_cache
    assert cache1 is not None and cache1[4].shape[1] == 8
    ids2, _ = idx.search(q, k=10, ef_search=32)
    assert idx._sd_cache is cache1  # second call reused the slices
    np.testing.assert_array_equal(ids1, ids2)
    # searched-degree results stay usable (rows are distance-sorted, so
    # the first 8 of 16 are the closest half; random unclustered data
    # is the hard case — the knob trades some recall for throughput)
    flat = FlatIndex(d, "cosine", use_pallas=False)
    flat.insert(np.arange(n), x)
    true_ids, _ = flat.search(q, k=10)
    hits = sum(
        len(set(a[a >= 0]) & set(b[b >= 0]))
        for a, b in zip(ids1, true_ids)
    )
    assert hits / (len(q) * 10) >= 0.6
    # knob change -> fresh slices
    idx.search_degree = 12
    idx.search(q, k=10, ef_search=32)
    assert idx._sd_cache is not cache1 and idx._sd_cache[4].shape[1] == 12
    # mutation swaps the source tables -> fresh slices again
    cache2 = idx._sd_cache
    idx.insert(np.arange(n, n + 4), x[:4])
    idx.search(q, k=10, ef_search=32)
    assert idx._sd_cache is not cache2


def test_grouped_bounded_append_with_padding(rng):
    """Monotone-sort regression: invalid (-1) targets must not corrupt
    the per-target run ranking (a raw -1 tail behind the sorted prefix
    broke searchsorted's precondition and silently mis-ranked the
    largest targets — lost reverse edges in every padded wave)."""
    from muninn_tpu.index.hnsw import _grouped_bounded_append
    import jax.numpy as jnp

    cap, a_max = 50, 3
    for trial in range(20):
        e = int(rng.integers(4, 60))
        tgt = rng.integers(-1, cap, e).astype(np.int32)
        src = rng.integers(0, cap, e).astype(np.int32)
        dd = rng.random(e).astype(np.float32)
        ai, ad = _grouped_bounded_append(
            jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(dd), cap, a_max
        )
        ai, ad = np.asarray(ai), np.asarray(ad)
        # reference: first a_max sources per target, input order
        want: dict = {}
        for t, s_, d_ in zip(tgt, src, dd):
            if t >= 0 and len(want.setdefault(int(t), [])) < a_max:
                want[int(t)].append((int(s_), float(d_)))
        for t in range(cap):
            got = [(int(s_), float(d_)) for s_, d_ in zip(ai[t], ad[t])
                   if s_ >= 0]
            assert sorted(got) == sorted(want.get(t, [])), (trial, t)


def test_hnsw_randomized_churn_differential(rng):
    """Property test: interleaved insert/delete waves never violate the
    engine invariants and keep recall against the exact oracle — the
    long-run insurance for the incremental wiring path."""
    dim = 16
    idx = HnswIndex(dim, "l2", m=6, ef_construction=48, wave_size=64,
                    seed=11)
    live: dict[int, np.ndarray] = {}
    next_id = 0
    for phase in range(6):
        n_ins = int(rng.integers(40, 120))
        vecs = rng.standard_normal((n_ins, dim)).astype(np.float32)
        ids = np.arange(next_id, next_id + n_ins)
        next_id += n_ins
        idx.insert(ids, vecs)
        live.update(zip(ids.tolist(), vecs))
        if phase >= 1 and len(live) > 80:
            kill = rng.choice(sorted(live), size=30, replace=False)
            idx.delete(kill)
            for i in kill.tolist():
                del live[i]
        assert len(idx) == len(live)

        # invariant: no live edge points at a tombstone slot
        nb = np.asarray(idx.neighbors0)
        valid = np.asarray(idx.store.valid)
        rows = nb[np.nonzero(valid)[0]]
        assert not ((rows >= 0) & ~valid[np.maximum(rows, 0)]).any()

    keys = np.array(sorted(live))
    mat = np.stack([live[i] for i in keys.tolist()])
    flat = FlatIndex(dim, "l2", use_pallas=False, capacity=2048)
    flat.insert(keys, mat)
    q = mat[rng.choice(len(keys), 25, replace=False)]
    got, _ = idx.search(q, k=5, ef_search=48)
    want, _ = flat.search(q, k=5)
    hits = sum(len(set(a[a >= 0]) & set(b[b >= 0]))
               for a, b in zip(got, want))
    assert hits / (25 * 5) >= 0.9
    # every returned id is live
    assert set(got[got >= 0].tolist()) <= set(keys.tolist())


def test_hnsw_full_lifecycle_edges(rng):
    """Lifecycle fuzz representative (8-trial campaign clean): odd-wave
    capacity growth, repeated entry-point deletion, delete-EVERYTHING,
    then reinsert of the SAME ids with different vectors (+ a zero
    vector) — searches stay oracle-exact at every phase."""
    dim, total = 8, 150
    idx = HnswIndex(dim, "l2", m=4, ef_construction=32, capacity=64,
                    seed=7, wave_size=32)
    vecs = rng.standard_normal((total, dim)).astype(np.float32)
    pos = 0
    while pos < total:
        step = int(rng.integers(1, 37))
        idx.insert(np.arange(pos, min(pos + step, total)),
                   vecs[pos:pos + step])
        pos += step
    assert len(idx) == total

    probe = vecs[0:1]
    killed = []
    for _ in range(10):
        top = int(np.asarray(idx.search(probe, k=1)[0])[0, 0])
        idx.delete(np.array([top]))
        killed.append(top)
    got, _ = idx.search(probe, k=10)
    assert not (set(np.asarray(got).ravel().tolist()) & set(killed))

    idx.delete(np.array(sorted(set(range(total)) - set(killed))))
    assert len(idx) == 0
    assert (np.asarray(idx.search(probe, k=5)[0]) == -1).all()

    v2 = rng.standard_normal((20, dim)).astype(np.float32)
    v2[3] = 0.0
    idx.insert(np.arange(20), v2)
    flat = FlatIndex(dim, "l2", use_pallas=False, capacity=64)
    flat.insert(np.arange(20), v2)
    q = v2 + 0.01 * rng.standard_normal((20, dim)).astype(np.float32)
    got2 = np.asarray(idx.search(q, k=3)[0])
    want2 = np.asarray(flat.search(q, k=3)[0])
    hits = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(got2, want2))
    assert hits / 60 >= 0.95
    assert int(np.asarray(idx.search(np.zeros((1, dim), np.float32),
                                     k=1)[0])[0, 0]) == 3
