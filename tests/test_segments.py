"""ops/segments unit tests vs numpy brute force.

The graph fixpoints exercise these indirectly; here the reductions are
pinned directly (reference strategy: pure-kernel suites vs brute
force, test/test_graph_csr.c role).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from muninn_tpu.ops.segments import (
    n_passes_for,
    seg_max,
    seg_min,
    seg_positions,
    seg_sum,
)

INF = np.float32(np.inf)


def random_offsets(rng, v, e_pad, max_deg):
    """Offsets for v segments with degrees in [0, max_deg], total <=
    e_pad (rest is padding past the last segment)."""
    degs = rng.integers(0, max_deg + 1, v)
    while degs.sum() > e_pad:
        degs[rng.integers(0, v)] = 0
    off = np.zeros(v + 1, np.int32)
    off[1:] = np.cumsum(degs)
    return off


def brute(vals, off, op, identity):
    out = []
    for i in range(len(off) - 1):
        seg = vals[off[i]:off[i + 1]]
        out.append(op(seg) if len(seg) else identity)
    return np.asarray(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_seg_min_max_match_brute(rng, seed):
    r = np.random.default_rng(seed)
    v, e_pad, max_deg = 37, 256, 19
    off = random_offsets(r, v, e_pad, max_deg)
    vals = r.standard_normal(e_pad).astype(np.float32)
    spos = seg_positions(jnp.asarray(off), e_pad)
    npass = n_passes_for(max_deg)
    got_min = np.asarray(seg_min(jnp.asarray(vals), spos, jnp.asarray(off),
                                 INF, npass))
    got_max = np.asarray(seg_max(jnp.asarray(vals), spos, jnp.asarray(off),
                                 -INF, npass))
    np.testing.assert_allclose(got_min, brute(vals, off, np.min, INF))
    np.testing.assert_allclose(got_max, brute(vals, off, np.max, -INF))


def test_seg_min_int_identity(rng):
    """int32 values with an INT-style big identity (the BFS fixpoint
    shape) — empty segments come back as identity."""
    v, e_pad = 10, 64
    off = np.array([0, 3, 3, 7, 7, 7, 20, 25, 40, 64, 64], np.int32)
    vals = rng.integers(0, 1000, e_pad).astype(np.int32)
    big = np.int32(2**30)
    spos = seg_positions(jnp.asarray(off), e_pad)
    got = np.asarray(seg_min(jnp.asarray(vals), spos, jnp.asarray(off),
                             big, n_passes_for(24)))
    want = brute(vals, off, np.min, big)
    np.testing.assert_array_equal(got, want)
    assert got[1] == big and got[3] == big and got[4] == big and got[9] == big


def test_seg_sum_matches_brute(rng):
    v, e_pad, max_deg = 29, 2048, 40
    r = np.random.default_rng(7)
    off = random_offsets(r, v, e_pad, max_deg)
    vals = np.zeros(e_pad, np.float32)
    n_valid = off[-1]
    vals[:n_valid] = r.standard_normal(n_valid).astype(np.float32)  # pads 0
    got = np.asarray(seg_sum(jnp.asarray(vals), jnp.asarray(off)))
    want = brute(vals, off, np.sum, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_seg_sum_batched_leading_axis(rng):
    """seg_sum broadcasts over leading axes (Brandes runs batched
    sources through one call)."""
    off = np.array([0, 2, 5, 5, 8], np.int32)
    vals = rng.standard_normal((3, 8)).astype(np.float32)
    got = np.asarray(seg_sum(jnp.asarray(vals), jnp.asarray(off), ch=4))
    for b in range(3):
        np.testing.assert_allclose(
            got[b], brute(vals[b], off, np.sum, 0.0), rtol=1e-5, atol=1e-6
        )


def test_n_passes_boundaries():
    assert n_passes_for(1) == 1
    assert n_passes_for(2) == 1
    assert n_passes_for(3) == 2
    assert n_passes_for(1024) == 10
    assert n_passes_for(1025) == 11


def test_seg_min_insufficient_passes_is_wrong_by_design(rng):
    """n_passes below log2(max segment) under-reduces — the static
    pass count is a real contract, pinned here so callers keep using
    n_passes_for(max_deg)."""
    e_pad = 64
    off = np.array([0, 64], np.int32)  # one segment of 64
    vals = np.arange(64, 0, -1).astype(np.float32)  # min at the END
    spos = seg_positions(jnp.asarray(off), e_pad)
    ok = np.asarray(seg_min(jnp.asarray(vals), spos, jnp.asarray(off),
                            INF, n_passes_for(64)))
    assert ok[0] == 1.0
    short = np.asarray(seg_min(jnp.asarray(vals), spos, jnp.asarray(off),
                               INF, 2))
    assert short[0] == 1.0  # last element IS the min here regardless
    # make the min land mid-segment instead: shift-doubling from the
    # right edge must still find it with enough passes
    vals2 = np.full(64, 100.0, np.float32)
    vals2[1] = -5.0
    ok2 = np.asarray(seg_min(jnp.asarray(vals2), spos, jnp.asarray(off),
                             INF, n_passes_for(64)))
    assert ok2[0] == -5.0
    short2 = np.asarray(seg_min(jnp.asarray(vals2), spos, jnp.asarray(off),
                                INF, 1))
    assert short2[0] != -5.0


# ───────────── chunked forms (the 100M-edge memory regime) ─────────────


@pytest.mark.parametrize("seed,chunk", [(0, 32), (1, 64), (2, 128)])
def test_seg_reduce_chunked_matches_one_shot(rng, seed, chunk):
    """Chunk boundaries split segments arbitrarily; the per-chunk
    portions must combine to the exact one-shot reduction."""
    from muninn_tpu.ops.segments import (
        seg_positions_chunked,
        seg_reduce_chunked,
    )

    r = np.random.default_rng(seed)
    v, e_pad, max_deg = 53, 512, 37  # max_deg > chunk/2 splits often
    off = random_offsets(r, v, e_pad, max_deg)
    vals = r.integers(-1000, 1000, e_pad).astype(np.int32)
    npass = n_passes_for(max_deg)
    offj = jnp.asarray(off)
    spos_c = seg_positions_chunked(offj, e_pad, chunk, npass)
    valsj = jnp.asarray(vals)

    got = np.asarray(seg_reduce_chunked(
        lambda cs: jax.lax.dynamic_slice(valsj, (cs,), (chunk,)),
        spos_c, offj, np.int32(2**30), npass, chunk, jnp.minimum,
        jnp.int32,
    ))
    want = brute(vals, off, np.min, np.int32(2**30))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,chunk", [(0, 32), (3, 256)])
def test_seg_sum_chunked_matches_brute(rng, seed, chunk):
    from muninn_tpu.ops.segments import seg_sum_chunked

    r = np.random.default_rng(seed)
    v, e_pad, max_deg = 41, 512, 50
    off = random_offsets(r, v, e_pad, max_deg)
    vals = r.standard_normal(e_pad).astype(np.float32)
    vals[off[-1]:] = 0.0  # pads must contribute 0
    valsj = jnp.asarray(vals)

    got = np.asarray(seg_sum_chunked(
        lambda cs: jax.lax.dynamic_slice(valsj, (cs,), (chunk,)),
        jnp.asarray(off), e_pad, chunk, ch=16,
    ))
    want = brute(vals, off, np.sum, np.float32(0.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_seg_positions_chunked_clips_exactly():
    """Clipped positions equal the exact ones wherever a >=shift test
    can distinguish them (values below the clip cap)."""
    from muninn_tpu.ops.segments import (
        seg_positions_chunked,
        spos_dtype_for,
    )

    r = np.random.default_rng(7)
    v, e_pad = 29, 256
    off = random_offsets(r, v, e_pad, 21)
    npass = n_passes_for(21)
    dt, cap = spos_dtype_for(npass)
    exact = np.asarray(seg_positions(jnp.asarray(off), e_pad))
    got = np.asarray(
        seg_positions_chunked(jnp.asarray(off), e_pad, 32, npass)
    )
    np.testing.assert_array_equal(got, np.minimum(exact, cap).astype(got.dtype))
    assert got.dtype == np.dtype(dt)


def test_bincount_chunked_matches_numpy(rng):
    from muninn_tpu.ops.segments import bincount_chunked

    for seed in (0, 1):
        r = np.random.default_rng(seed)
        e_pad, nb = 512, 37
        ids = r.integers(0, nb + 1, e_pad).astype(np.int32)  # nb = pad
        w = r.random(e_pad).astype(np.float32)
        live = ids < nb
        got_u = np.asarray(bincount_chunked(jnp.asarray(ids), None, nb, 64))
        want_u = np.bincount(ids[live], minlength=nb).astype(np.float32)
        np.testing.assert_allclose(got_u, want_u)
        got_w = np.asarray(
            bincount_chunked(jnp.asarray(ids), jnp.asarray(w), nb, 64)
        )
        want_w = np.bincount(ids[live], weights=w[live], minlength=nb)
        np.testing.assert_allclose(got_w, want_w, rtol=1e-5, atol=1e-5)


def test_chunked_reducers_reject_ragged_tail(rng):
    """A chunk that does not divide e_pad would silently drop the tail;
    the static guard must reject it instead."""
    import pytest
    from muninn_tpu.ops.segments import (
        bincount_chunked,
        seg_positions_chunked,
        seg_sum_chunked,
    )

    off = jnp.asarray(np.array([0, 3, 100], np.int32))
    vals = jnp.zeros((100,), jnp.float32)
    ids = jnp.zeros((100,), jnp.int32)
    with pytest.raises(ValueError):
        bincount_chunked(ids, None, 2, 48)
    with pytest.raises(ValueError):
        seg_sum_chunked(lambda c: jax.lax.dynamic_slice(vals, (c,), (48,)),
                        off, 100, 48)
    with pytest.raises(ValueError):
        seg_positions_chunked(off, 100, 48, 4)
