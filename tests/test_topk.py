"""Masked top-k / merge primitives (the priority_queue.c replacement)."""

import numpy as np
import jax.numpy as jnp

from muninn_tpu.ops.topk import masked_topk, merge_topk, sorted_topk_unique


def test_masked_topk_basic(rng):
    d = rng.standard_normal((3, 20)).astype(np.float32)
    td, ti = masked_topk(jnp.array(d), 5)
    td, ti = np.asarray(td), np.asarray(ti)
    for b in range(3):
        want = np.sort(d[b])[:5]
        np.testing.assert_allclose(td[b], want, rtol=1e-6)
        np.testing.assert_allclose(d[b][ti[b]], want, rtol=1e-6)


def test_masked_topk_respects_mask(rng):
    d = rng.standard_normal((2, 10)).astype(np.float32)
    mask = np.zeros((2, 10), bool)
    mask[:, :3] = True
    td, ti = masked_topk(jnp.array(d), 5, mask=jnp.array(mask))
    td, ti = np.asarray(td), np.asarray(ti)
    assert (ti[:, :3] < 3).all()
    assert (ti[:, 3:] == -1).all()
    assert np.isinf(td[:, 3:]).all()


def test_masked_topk_k_larger_than_n(rng):
    d = rng.standard_normal((1, 4)).astype(np.float32)
    td, ti = masked_topk(jnp.array(d), 8)
    assert td.shape == (1, 8)
    assert np.isinf(np.asarray(td)[0, 4:]).all()
    assert (np.asarray(ti)[0, 4:] == -1).all()


def test_masked_topk_custom_ids(rng):
    d = rng.standard_normal((1, 6)).astype(np.float32)
    ids = jnp.array([[10, 11, 12, 13, 14, 15]], dtype=jnp.int32)
    _, ti = masked_topk(jnp.array(d), 3, ids=ids)
    want = np.argsort(d[0])[:3] + 10
    np.testing.assert_array_equal(np.asarray(ti)[0], want)


def test_merge_topk_merges_and_dedups():
    da = jnp.array([[1.0, 3.0, 5.0]])
    ia = jnp.array([[1, 3, 5]], dtype=jnp.int32)
    db = jnp.array([[2.0, 3.0, 9.0]])
    ib = jnp.array([[2, 3, 9]], dtype=jnp.int32)  # id 3 duplicated
    md, mi = merge_topk(da, ia, db, ib)
    np.testing.assert_allclose(np.asarray(md)[0], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(mi)[0], [1, 2, 3])


def test_merge_topk_with_invalid_slots():
    da = jnp.array([[1.0, np.inf]])
    ia = jnp.array([[4, -1]], dtype=jnp.int32)
    db = jnp.array([[0.5, np.inf]])
    ib = jnp.array([[7, -1]], dtype=jnp.int32)
    md, mi = merge_topk(da, ia, db, ib)
    np.testing.assert_allclose(np.asarray(md)[0], [0.5, 1.0])
    np.testing.assert_array_equal(np.asarray(mi)[0], [7, 4])


def test_sorted_topk_unique(rng):
    d = jnp.array([[4.0, 1.0, 4.0, 2.0]])
    i = jnp.array([[8, 5, 8, 6]], dtype=jnp.int32)
    sd, si = sorted_topk_unique(d, i, 3)
    np.testing.assert_allclose(np.asarray(sd)[0], [1.0, 2.0, 4.0])
    np.testing.assert_array_equal(np.asarray(si)[0], [5, 6, 8])


def test_merge_topk_random_vs_numpy(rng):
    for _ in range(5):
        da = np.sort(rng.standard_normal((2, 8)).astype(np.float32), axis=1)
        db = np.sort(rng.standard_normal((2, 6)).astype(np.float32), axis=1)
        ia = rng.permutation(100)[:16].reshape(2, 8).astype(np.int32)
        ib = (rng.permutation(100)[:12] + 200).reshape(2, 6).astype(np.int32)
        md, mi = merge_topk(jnp.array(da), jnp.array(ia), jnp.array(db), jnp.array(ib))
        for b in range(2):
            allv = np.concatenate([da[b], db[b]])
            want = np.sort(allv)[:8]
            np.testing.assert_allclose(np.asarray(md)[b], want, rtol=1e-6)


def test_merge_topk_flagged_keeps_expanded_copy():
    from muninn_tpu.ops.topk import merge_topk_flagged
    import jax.numpy as jnp

    da = jnp.array([[1.0, 3.0]])
    ia = jnp.array([[5, 7]], dtype=jnp.int32)
    fa = jnp.array([[True, False]])
    db = jnp.array([[1.0, 2.0]])
    ib = jnp.array([[5, 9]], dtype=jnp.int32)   # id 5 duplicated, unexpanded
    fb = jnp.array([[False, False]])
    md, mi, mf = merge_topk_flagged(da, ia, fa, db, ib, fb)
    np.testing.assert_array_equal(np.asarray(mi)[0], [5, 9])
    # the surviving id-5 copy keeps its expanded flag
    assert bool(np.asarray(mf)[0][0]) is True
    np.testing.assert_allclose(np.asarray(md)[0], [1.0, 2.0])


def test_pallas_gather_rows_interpret(rng):
    """DMA row-gather kernel (ops/pallas_gather) matches fancy indexing
    (interpret mode; the TPU path is exercised by bench probes)."""
    import jax.numpy as jnp

    from muninn_tpu.ops.pallas_gather import gather_rows

    x = rng.standard_normal((512, 128)).astype(np.float32)
    idx = rng.integers(0, 512, 256).astype(np.int32)
    out = np.asarray(
        gather_rows(jnp.asarray(x), jnp.asarray(idx), rb=64, interpret=True)
    )
    np.testing.assert_array_equal(out, x[idx])


def test_topk_ops_random_shapes_vs_numpy():
    """Fuzz representative (150-trial campaign ran clean): random
    shapes/tie densities/dup ids vs brute-force numpy — masked_topk
    achievable distances, merge_topk best-occurrence dedup + ascending
    order, sorted_topk_unique fixed width + unique ids,
    merge_topk_flagged expanded-wins flag carry."""
    rng = np.random.default_rng(47)
    for trial in range(12):
        b = int(rng.integers(1, 4))
        n = int(rng.integers(1, 30))
        k = int(rng.integers(1, 14))
        d = rng.choice([0.5, 1.0, 2.0, 3.5], (b, n)).astype(np.float32)
        mask = rng.random((b, n)) < 0.8 if trial % 2 else None
        gd, gi = map(np.asarray, masked_topk(d, k, mask=mask))
        md = np.where(mask, d, np.inf) if mask is not None else d
        wd = np.sort(md, axis=-1)[:, :k]
        kk = min(k, n)
        assert np.allclose(gd[:, :kk], wd[:, :kk])
        assert np.all(np.isinf(gd[:, kk:])) and np.all(gi[:, kk:] == -1)
        assert np.all((gi >= 0) == ~np.isinf(gd))

        ka, kb = int(rng.integers(1, 10)), int(rng.integers(1, 10))
        da = np.sort(rng.choice([0.5, 1.0, 9.9], (b, ka)), -1).astype(np.float32)
        db = np.sort(rng.choice([0.4, 1.0, 9.9], (b, kb)), -1).astype(np.float32)
        ia = rng.integers(-1, 6, (b, ka)).astype(np.int32)
        ib = rng.integers(-1, 6, (b, kb)).astype(np.int32)
        da = np.where(ia < 0, np.inf, da)
        db = np.where(ib < 0, np.inf, db)
        od, oi = map(np.asarray, merge_topk(da, ia, db, ib))
        assert od.shape == (b, ka)
        for bb in range(b):
            best = {}
            for dd, ii in list(zip(da[bb], ia[bb])) + list(zip(db[bb], ib[bb])):
                if ii >= 0:
                    best[int(ii)] = min(best.get(int(ii), np.inf), float(dd))
            want = sorted(best.values())[:ka]
            got = [float(od[bb, j]) for j in range(ka) if oi[bb, j] >= 0]
            assert np.allclose(got, want), (got, want)
            valid = oi[bb][oi[bb] >= 0]
            assert len(valid) == len(set(valid.tolist()))

        sk = int(rng.integers(1, 12))
        sd_, si_ = map(np.asarray, sorted_topk_unique(da, ia, sk))
        assert sd_.shape == (b, sk)
        for bb in range(b):
            valid = si_[bb][si_[bb] >= 0]
            assert len(valid) == len(set(valid.tolist()))
            assert np.all(np.isinf(sd_[bb][si_[bb] < 0]))
