"""FlatIndex + Pallas flat_topk (interpret mode on CPU) vs numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from muninn_tpu.index.flat import FlatIndex, _xla_chunked_topk
from muninn_tpu.ops.pallas_flat import flat_topk
from muninn_tpu.ops.distance import Metric


def brute(q, c, metric, k, valid=None):
    if metric == "l2":
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    elif metric == "inner_product":
        d = -(q @ c.T)
    else:
        qn = np.linalg.norm(q, axis=1)[:, None]
        cn = np.linalg.norm(c, axis=1)[None, :]
        d = 1 - (q @ c.T) / np.maximum(qn * cn, 1e-30)
    if valid is not None:
        d = np.where(valid[None, :], d, np.inf)
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


@pytest.mark.parametrize("metric", ["l2", "cosine", "inner_product"])
def test_pallas_flat_topk_matches_brute(rng, metric):
    q = rng.standard_normal((5, 40)).astype(np.float32)
    c = rng.standard_normal((300, 40)).astype(np.float32)
    d, i = flat_topk(
        jnp.array(q), jnp.array(c), 10, metric=metric,
        tb=8, tc=128, interpret=True,
    )
    wd, wi = brute(q, c, metric, 10)
    np.testing.assert_allclose(np.asarray(d), wd, rtol=1e-3, atol=1e-3)
    # ids may differ on ties; compare via distances
    np.testing.assert_array_equal(np.asarray(i), wi)


def test_pallas_flat_topk_validity_mask(rng):
    q = rng.standard_normal((3, 16)).astype(np.float32)
    c = rng.standard_normal((100, 16)).astype(np.float32)
    valid = rng.random(100) > 0.4
    d, i = flat_topk(
        jnp.array(q), jnp.array(c), 5, metric="l2",
        corpus_valid=jnp.array(valid), tb=8, tc=64, interpret=True,
    )
    wd, wi = brute(q, c, "l2", 5, valid)
    np.testing.assert_allclose(np.asarray(d), wd, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(i), wi)
    assert valid[np.asarray(i)].all()


def test_xla_chunked_matches_brute(rng):
    q = rng.standard_normal((4, 24)).astype(np.float32)
    c = rng.standard_normal((500, 24)).astype(np.float32)
    valid = np.ones(500, bool)
    d, i = _xla_chunked_topk(jnp.array(q), jnp.array(c), jnp.array(valid),
                             7, Metric.L2, chunk=128)
    wd, wi = brute(q, c, "l2", 7)
    np.testing.assert_allclose(np.asarray(d), wd, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(i), wi)


def test_flat_index_end_to_end(rng):
    idx = FlatIndex(32, "l2", use_pallas=False)
    vecs = rng.standard_normal((200, 32)).astype(np.float32)
    ids = np.arange(1000, 1200)
    idx.insert(ids, vecs)
    assert len(idx) == 200

    q = vecs[17] + 0.001
    got_ids, got_d = idx.search(q, k=3)
    assert got_ids[0] == 1017
    assert got_d[0] < 0.01

    # delete the best hit; it must vanish from results
    idx.delete([1017])
    got_ids, _ = idx.search(q, k=3)
    assert 1017 not in got_ids
    assert len(idx) == 199


def test_flat_index_batched_search(rng):
    idx = FlatIndex(16, "cosine", use_pallas=False)
    vecs = rng.standard_normal((64, 16)).astype(np.float32)
    idx.insert(np.arange(64), vecs)
    ids, d = idx.search(vecs[:8], k=1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(8))
    assert (d[:, 0] < 1e-4).all()


def test_flat_index_dim_mismatch(rng):
    idx = FlatIndex(8, "l2", use_pallas=False)
    idx.insert([1], rng.standard_normal((1, 8)).astype(np.float32))
    with pytest.raises(ValueError):
        idx.search(np.zeros(9), k=1)


def test_flat_index_duplicate_id(rng):
    idx = FlatIndex(8, "l2", use_pallas=False)
    idx.insert([1], rng.standard_normal((1, 8)).astype(np.float32))
    with pytest.raises(ValueError):
        idx.insert([1], rng.standard_normal((1, 8)).astype(np.float32))


def test_flat_topk_int8_mode(rng):
    """int8 quantized path: ~0.97+ recall@10 vs exact on unit vectors,
    l2 rejected, masking respected."""
    from muninn_tpu.ops.pallas_flat import flat_topk

    n, d, b, k = 2000, 64, 32, 10
    c = rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = c[rng.integers(0, n, b)] + 0.05 * rng.standard_normal((b, d)).astype(
        np.float32
    )
    exact_d, exact_i = flat_topk(
        jnp.asarray(q), jnp.asarray(c), k, metric="cosine",
        precision="highest", interpret=True,
    )
    d8, i8 = flat_topk(
        jnp.asarray(q), jnp.asarray(c), k, metric="cosine",
        precision="int8", interpret=True,
    )
    exact_i, i8 = np.asarray(exact_i), np.asarray(i8)
    recall = sum(len(set(a) & set(bb)) for a, bb in zip(i8, exact_i)) / (b * k)
    assert recall >= 0.9, recall
    assert np.all(np.diff(np.asarray(d8), axis=1) >= -1e-6)

    # masking: invalid rows never returned
    valid = np.ones(n, bool)
    top = int(exact_i[0, 0])
    valid[top] = False
    _, i8m = flat_topk(
        jnp.asarray(q[:1]), jnp.asarray(c), k, metric="cosine",
        precision="int8", corpus_valid=jnp.asarray(valid), interpret=True,
    )
    assert top not in set(np.asarray(i8m)[0].tolist())

    with pytest.raises(ValueError, match="int8"):
        flat_topk(jnp.asarray(q), jnp.asarray(c), k, metric="l2",
                  precision="int8", interpret=True)


def test_quantized_flat_index(rng):
    """int8-stored index: insert/search/delete contract + recall vs the
    exact f32 index; storage really is int8 (4x capacity claim)."""
    from muninn_tpu.index.flat import FlatIndex, QuantizedFlatIndex

    n, d, k = 3000, 48, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = v[rng.integers(0, n, 32)] + 0.05 * rng.standard_normal((32, d)).astype(
        np.float32
    )
    exact = FlatIndex(d, "cosine")
    exact.insert(np.arange(n), v)
    ti, _ = exact.search(q, k=k)

    qi = QuantizedFlatIndex(d, "cosine")
    qi.insert(np.arange(n), v)
    assert qi.store.vectors.dtype == jnp.int8
    ids, dists = qi.search(q, k=k)
    recall = sum(
        len(set(map(int, a)) & set(map(int, b)))
        for a, b in zip(np.asarray(ids), np.asarray(ti))
    ) / (32 * k)
    assert recall >= 0.9, recall
    assert np.all(np.diff(np.asarray(dists), axis=1) >= -1e-6)

    # single query + delete
    one_ids, one_d = qi.search(q[0], k=3)
    assert one_ids.shape == (3,)
    top = int(one_ids[0])
    qi.delete([top])
    after, _ = qi.search(q[0], k=3)
    assert top not in set(np.asarray(after).tolist())
    assert len(qi) == n - 1

    # growth across capacity boundary keeps scales in sync
    extra = rng.standard_normal((1200, d)).astype(np.float32)
    qi2 = QuantizedFlatIndex(d, "cosine", capacity=1024)
    qi2.insert(np.arange(1200), extra)
    ids2, _ = qi2.search(extra[7], k=1)
    assert int(ids2[0]) == 7

    with pytest.raises(ValueError, match="cosine/inner_product"):
        QuantizedFlatIndex(d, "l2")


def test_int8_rescored_precision_mode(rng):
    """FlatIndex precision='int8_rescored': int8 retrieval + exact f32
    rescore matches the exact ranking (near-exact recall; exact
    distances for returned ids)."""
    n, d, k = 500, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:32] + 0.05 * rng.standard_normal((32, d)).astype(np.float32)

    exact = FlatIndex(d, "cosine")
    exact.insert(np.arange(n), x)
    tid, tdist = exact.search(q, k=k)

    idx = FlatIndex(d, "cosine", precision="int8_rescored")
    idx.insert(np.arange(n), x)
    ids, dist = idx.search(q, k=k)
    recall = np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / k for a, b in zip(ids, tid)
    ])
    assert recall >= 0.95
    # returned distances are exact f32 (not quantized approximations)
    for a, da, b, db in zip(ids, dist, tid, tdist):
        common = set(a) & set(b)
        for cid in common:
            ia = list(a).index(cid); ib = list(b).index(cid)
            assert abs(da[ia] - db[ib]) < 1e-5
    # deletes respected without shadow rebuild
    idx.delete(tid[0][:3])
    ids2, _ = idx.search(q[:1], k=k)
    assert not (set(tid[0][:3]) & set(ids2[0]))


def test_pick_rescore_r_prefix_curve():
    """The ladder helper: monotone curve from one probe; smallest r
    clearing the target wins; fallback to ladder max."""
    from muninn_tpu.index.flat import pick_rescore_r

    # 2 queries, k=3, r_max=8: true ids sit at candidate ranks
    # q0: 0,1,2 (all in top-4); q1: 0,1,7 (last one only at r=8)
    cand = np.array([
        [10, 11, 12, 13, 14, 15, 16, 17],
        [20, 21, 22, 23, 24, 25, 26, 27],
    ])
    true = np.array([[10, 11, 12], [20, 21, 27]])
    r, curve = pick_rescore_r(true, cand, (4, 8), target_recall=0.99)
    assert curve[4] == (3 / 3 + 2 / 3) / 2
    assert curve[8] == 1.0
    assert r == 8
    r2, _ = pick_rescore_r(true, cand, (4, 8), target_recall=0.80)
    assert r2 == 4
    # nothing clears an impossible target -> ladder max
    true_missing = np.array([[99, 98, 97], [96, 95, 94]])
    r3, curve3 = pick_rescore_r(true_missing, cand, (4, 8), 0.5)
    assert r3 == 8 and curve3[8] == 0.0
    # -1 padding (fewer than k valid) doesn't poison the denominator
    true_pad = np.array([[10, -1, -1], [20, -1, -1]])
    r4, curve4 = pick_rescore_r(true_pad, cand, (4,), 0.99)
    assert curve4[4] == 1.0 and r4 == 4


def test_tune_rescore_r_end_to_end(rng):
    """tune_rescore_r picks a ladder point, sets rescore_r, and search
    at the tuned r preserves recall >= the probed target."""
    n, d, k = 800, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    idx = FlatIndex(d, "cosine", precision="int8_rescored")
    idx.insert(np.arange(n), x)
    r = idx.tune_rescore_r(k=k, target_recall=0.98, sample=128, seed=3)
    assert r == idx.rescore_r
    assert r in idx.tune_report
    # curve is monotone non-decreasing in r
    rs = sorted(idx.tune_report)
    vals = [idx.tune_report[z] for z in rs]
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))
    assert idx.tune_report[r] >= 0.98 or r == max(rs)

    # measured recall at the tuned operating point on fresh queries
    q = x[:64] + 0.05 * rng.standard_normal((64, d)).astype(np.float32)
    exact = FlatIndex(d, "cosine")
    exact.insert(np.arange(n), x)
    tid, _ = exact.search(q, k=k)
    ids, _ = idx.search(q, k=k)
    recall = np.mean([len(set(a) & set(b)) / k for a, b in zip(ids, tid)])
    assert recall >= 0.9


def test_search_device_matches_search_all_engines(rng):
    """search_device is the engine dispatch under search: device-array
    (dists, slots) in slot space, identical results after id mapping —
    for every index engine (the harness and serving throughput paths
    queue search_device dispatches and sync once per batch)."""
    import jax
    from muninn_tpu.index.flat import QuantizedFlatIndex
    from muninn_tpu.index.hnsw import HnswIndex
    from muninn_tpu.index.ivf import IvfIndex

    n, d, k = 600, 32, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:17] + 0.05 * rng.standard_normal((17, d)).astype(np.float32)
    ids = np.arange(100, 100 + n)  # non-slot external ids

    engines = [
        FlatIndex(d, "cosine"),
        QuantizedFlatIndex(d, "cosine"),
        HnswIndex(d, "cosine", m=8, ef_construction=40, capacity=2 * n),
        IvfIndex(d, "cosine", capacity=2 * n),
    ]
    for idx in engines:
        idx.insert(ids, x)
        dd, slots = idx.search_device(q, k=k)
        assert isinstance(dd, jax.Array) and isinstance(slots, jax.Array)
        assert dd.shape == (17, k) and slots.shape == (17, k)
        got_ids, got_d = idx.search(q, k=k)
        np.testing.assert_array_equal(
            idx.store.ids_of(np.asarray(slots)), got_ids
        )
        np.testing.assert_allclose(np.asarray(dd), got_d, rtol=1e-6)
        # single-query path still returns 1-D
        one_ids, one_d = idx.search(q[0], k=k)
        assert one_ids.shape == (k,) and one_d.shape == (k,)


def test_proj_basis_properties(rng):
    """Uncentered-PCA basis: orthonormal columns, and projected dots
    approximate original dots on data living near a low-dim subspace."""
    from muninn_tpu.ops.pallas_flat import proj_basis

    # data on a 12-dim subspace of 64-d + small noise
    core = rng.standard_normal((400, 12)).astype(np.float32)
    lift = rng.standard_normal((12, 64)).astype(np.float32)
    x = core @ lift + 0.01 * rng.standard_normal((400, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    w = np.asarray(proj_basis(jnp.asarray(x), 16, chunk=128))
    assert w.shape == (64, 16)
    np.testing.assert_allclose(w.T @ w, np.eye(16), atol=1e-4)
    xp = x @ w
    dots = x[:50] @ x[50:100].T
    dots_p = xp[:50] @ xp[50:100].T
    np.testing.assert_allclose(dots_p, dots, atol=0.02)
    import pytest

    with pytest.raises(ValueError):
        proj_basis(jnp.asarray(x), 0)


def test_proj_rescored_precision_mode(rng):
    """FlatIndex precision='proj_rescored': int8 projected retrieve +
    exact f32 rescore — near-exact recall on clustered data at a
    fraction of the scan bytes; exact distances for returned ids."""
    import pytest

    n, d, k = 800, 96, 10
    centers = rng.standard_normal((12, d)).astype(np.float32)
    x = centers[rng.integers(0, 12, n)] + 0.3 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:32] + 0.05 * rng.standard_normal((32, d)).astype(np.float32)

    exact = FlatIndex(d, "cosine")
    exact.insert(np.arange(n), x)
    tid, tdist = exact.search(q, k=k)

    idx = FlatIndex(d, "cosine", precision="proj_rescored", proj_dim=32)
    idx.insert(np.arange(n), x)
    idx.rescore_r = 48
    ids, dist = idx.search(q, k=k)
    recall = np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / k for a, b in zip(ids, tid)
    ])
    assert recall >= 0.95, recall
    for a, da, b, db in zip(ids, dist, tid, tdist):
        for cid in set(a) & set(b):
            ia = list(a).index(cid); ib = list(b).index(cid)
            assert abs(da[ia] - db[ib]) < 1e-5
    # churn: insert invalidates the shadow (basis + rows refresh)
    assert idx._proj is not None
    idx.insert([n], x[:1] * -1.0)
    assert idx._proj is None
    _ = idx.search(q[:1], k=k)
    assert idx._proj is not None and idx._proj[1].shape[0] == n + 1
    # deletes respected without shadow rebuild
    idx.delete(tid[0][:3])
    ids2, _ = idx.search(q[:1], k=k)
    assert not (set(tid[0][:3]) & set(ids2[0]))
    # L2 is rejected
    bad = FlatIndex(d, "l2", precision="proj_rescored")
    bad.insert(np.arange(4), x[:4])
    with pytest.raises(ValueError):
        bad.search(q[:1], k=2)


def test_tune_rescore_r_proj_mode(rng):
    """The r-autotune works on the projected mode: the candidate
    prefix-containment curve drives the choice, and the chosen r
    clears the target recall end to end."""
    n, d, k = 600, 64, 10
    centers = rng.standard_normal((8, d)).astype(np.float32)
    x = centers[rng.integers(0, 8, n)] + 0.3 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = FlatIndex(d, "cosine", precision="proj_rescored", proj_dim=24)
    idx.insert(np.arange(n), x)
    r = idx.tune_rescore_r(k=k, target_recall=0.98, sample=64, seed=3)
    assert r == idx.rescore_r and r >= k
    assert idx.tune_report[r] >= 0.98 or r == max(idx.tune_report)

    exact = FlatIndex(d, "cosine")
    exact.insert(np.arange(n), x)
    q = x[:32] + 0.05 * rng.standard_normal((32, d)).astype(np.float32)
    tid, _ = exact.search(q, k=k)
    ids, _ = idx.search(q, k=k)
    recall = np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / k for a, b in zip(ids, tid)
    ])
    assert recall >= 0.9


def test_flat_topk_random_geometry_vs_numpy(rng):
    """Fuzz representative (40-trial campaign clean): odd B/N/d, k>N,
    all-invalid and single-valid masks, duplicate rows, both precision
    modes, odd tile sizes — distances match brute-force numpy and the
    (inf, -1) padding contract holds."""
    from muninn_tpu.ops.distance import Metric
    from muninn_tpu.ops.pallas_flat import flat_topk

    for trial in range(6):
        b = int(rng.integers(1, 12))
        n = int(rng.integers(1, 300))
        d = int(rng.integers(2, 60))
        k = int(rng.choice([1, 5, n + 3]))
        metric = [Metric.L2, Metric.COSINE, Metric.INNER_PRODUCT][trial % 3]
        valid = [None,
                 rng.random(n) < 0.6,
                 np.zeros(n, bool)][trial % 3]
        q = rng.standard_normal((b, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        prec = "highest" if trial % 2 else "default"
        gd, gi = flat_topk(q, c, k, metric=metric, corpus_valid=valid,
                           tb=64, tc=512, interpret=True, precision=prec)
        gd, gi = np.asarray(gd), np.asarray(gi)
        if metric is Metric.COSINE:
            qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
            cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
            full = 1.0 - qn @ cn.T
        elif metric is Metric.L2:
            full = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        else:
            full = -(q @ c.T)
        if valid is not None:
            full = np.where(valid[None, :], full, np.inf)
        wd = np.sort(full, axis=1)[:, :k]
        if wd.shape[1] < k:
            wd = np.pad(wd, ((0, 0), (0, k - wd.shape[1])),
                        constant_values=np.inf)
        tol = 2e-3 if prec == "highest" else 3e-2
        finite = np.isfinite(wd)
        assert np.all(np.isinf(gd) == ~finite)
        assert np.allclose(gd[finite], wd[finite], atol=tol, rtol=tol)
        assert np.all((gi >= 0) == finite)
