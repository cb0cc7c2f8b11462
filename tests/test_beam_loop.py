"""Whole-beam Pallas kernel (ops/pallas_beam_loop) vs the XLA beam.

The kernel mirrors ``_beam_search_level0``'s semantics exactly (pick /
dedup / merge / fill-aware patience), so the two paths are compared
directly; residual differences can only come from float-accumulation
order on near-tied beam boundaries.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from muninn_tpu.index.hnsw import (
    HnswIndex,
    _beam_search_level0,
    _route_entries,
    _search_topk_whole,
)
from muninn_tpu.ops.distance import Metric, gathered_distances
from muninn_tpu.ops.pallas_beam_loop import (
    ID_LANES,
    beam_loop,
    pack_wide,
    split_id_bytes,
)
from muninn_tpu.ops.pallas_flat import flat_topk


def test_split_id_bytes_roundtrip():
    rng = np.random.default_rng(0)
    ids = np.concatenate(
        [[-1, 0, 1, 255, 256, 65535, 65536, (1 << 24) - 2],
         rng.integers(-1, 1 << 24, size=200)]
    )
    b = split_id_bytes(ids)
    # bf16 cast must be exact for byte values
    b16 = np.asarray(jnp.asarray(b, jnp.bfloat16), np.float32)
    dec = (
        b16[..., 0].astype(np.int64) * 65536
        + b16[..., 1].astype(np.int64) * 256
        + b16[..., 2].astype(np.int64)
        - 1
    )
    np.testing.assert_array_equal(dec, ids)
    with pytest.raises(ValueError):
        split_id_bytes(np.array([1 << 24]))
    with pytest.raises(ValueError):
        split_id_bytes(np.array([-2]))


def test_pack_wide_layout():
    rng = np.random.default_rng(1)
    cap, r0, d = 32, 16, 128
    v16 = jnp.asarray(rng.standard_normal((cap, d)), jnp.bfloat16)
    nb = rng.integers(-1, cap, size=(cap, r0)).astype(np.int32)
    pw = np.asarray(pack_wide(v16, jnp.asarray(nb)), np.float32)
    assert pw.shape == (cap, r0, d + ID_LANES)
    v16np = np.asarray(v16, np.float32)
    for s in [0, 7, 31]:
        for j in [0, 5, r0 - 1]:
            np.testing.assert_array_equal(
                pw[s, j, :d], v16np[max(nb[s, j], 0)]
            )
            dec = (
                int(pw[s, j, d]) * 65536
                + int(pw[s, j, d + 1]) * 256
                + int(pw[s, j, d + 2])
                - 1
            )
            assert dec == nb[s, j]
            assert not pw[s, j, d + 3 :].any()


@pytest.fixture(scope="module")
def built_index():
    rng = np.random.default_rng(7)
    n, d = 3000, 128
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswIndex(d, metric="cosine", m=8, ef_construction=100, seed=3)
    idx.insert(np.arange(n, dtype=np.int64), vecs)
    queries = rng.standard_normal((64, d)).astype(np.float32)
    return idx, jnp.asarray(queries), vecs


def _whole_vs_xla_beams(idx, q, ef, expand, pick_xfer):
    metric = idx.metric
    v16 = idx._vecs16()
    pool = idx._routing_pool()
    r = min(idx.route_entries, ef)
    entries = _route_entries(q, idx.store.vectors, pool, metric, r)
    mi = -(-ef // expand) + 1
    xd, xi = _beam_search_level0(
        q, entries, v16, idx.neighbors0, metric, ef, expand, max_iters=mi
    )
    packedw = pack_wide(v16, idx.neighbors0)
    e_d = gathered_distances(
        q, v16[jnp.maximum(entries, 0)].astype(jnp.float32), metric
    )
    e_d = jnp.where(entries >= 0, e_d, jnp.inf)
    b = q.shape[0]
    init_d = jnp.full((b, ef), jnp.inf).at[:, :r].set(e_d)
    init_i = jnp.full((b, ef), -1, jnp.int32).at[:, :r].set(entries)
    wd, wi = beam_loop(
        q, init_d, init_i, packedw, metric=metric, ef=ef, expand=expand,
        max_iters=mi, interpret=True, pick_xfer=pick_xfer,
    )
    return (np.asarray(xd), np.asarray(xi)), (np.asarray(wd), np.asarray(wi))


def test_beam_loop_matches_xla_beam(built_index):
    idx, q, _ = built_index
    (xd, xi), (wd, wi) = _whole_vs_xla_beams(idx, q, ef=24, expand=4,
                                             pick_xfer="dma")
    # same semantics; only accumulation-order float noise on near-tied
    # beam boundaries may differ
    overlaps = []
    for t in range(q.shape[0]):
        a = set(xi[t][xi[t] >= 0].tolist())
        b = set(wi[t][wi[t] >= 0].tolist())
        inter = len(a & b)
        overlaps.append(inter / max(len(a), 1))
    assert np.mean(overlaps) >= 0.99, np.mean(overlaps)
    assert np.min(overlaps) >= 0.9, np.min(overlaps)
    # distances agree on the sorted beams where membership agrees
    agree = xi == wi
    np.testing.assert_allclose(
        np.where(agree & (xi >= 0), wd, 0.0),
        np.where(agree & (xi >= 0), xd, 0.0),
        rtol=2e-4, atol=2e-4,
    )


def test_pick_xfer_mechanisms_identical(built_index):
    idx, q, _ = built_index
    _, (dd, di) = _whole_vs_xla_beams(idx, q[:32], ef=16, expand=4,
                                      pick_xfer="dma")
    _, (sd, si) = _whole_vs_xla_beams(idx, q[:32], ef=16, expand=4,
                                      pick_xfer="scalar")
    np.testing.assert_array_equal(di, si)
    np.testing.assert_array_equal(dd, sd)


def test_whole_path_end_to_end_recall(built_index):
    idx, q, vecs = built_index
    k = 10
    # exact ground truth
    _, gt = flat_topk(
        q, idx.store.vectors[: len(vecs)], k, metric=idx.metric,
        precision="highest", interpret=True,
    )
    gt = np.asarray(gt)

    idx.beam_whole = "force"
    idx.search_bf16 = True
    idx.exact_small_n = 0
    try:
        d_w, s_w = idx.search_device(q, k=k, ef_search=32)
        idx.beam_whole = False
        d_f, s_f = idx.search_device(q, k=k, ef_search=32)
    finally:
        idx.beam_whole = False
        idx.search_bf16 = jax.default_backend() == "tpu"
        idx.exact_small_n = 8192
    s_w, s_f = np.asarray(s_w), np.asarray(s_f)

    def recall(s):
        hits = sum(
            len(set(s[t].tolist()) & set(gt[t].tolist()))
            for t in range(q.shape[0])
        )
        return hits / (q.shape[0] * k)

    r_w, r_f = recall(s_w), recall(s_f)
    # parity with the fused path is the contract; absolute recall here
    # is low by design (exact_small_n=0 bypasses the small-N exact
    # route, and a 3k corpus has a ~375-node promoted pool)
    assert r_w >= r_f - 0.01, (r_w, r_f)
    assert r_w >= 0.5, r_w
    # distances sorted ascending, finite for found slots
    d_w = np.asarray(d_w)
    ok = s_w >= 0
    assert np.all(np.isfinite(d_w[ok]))


def test_beam_loop_exact_equality_on_grid_vectors():
    """Bounded representative of tools/soak/beam_loop.py: integer-grid
    vectors make every dot/sqnorm exact in f32, so the whole-beam
    kernel must match the XLA fused beam EXACTLY (ids bit-equal)."""
    rng = np.random.default_rng(23)
    for trial in range(3):
        d, r0 = 128, 16
        cap = int(rng.integers(96, 400))
        b = int(rng.integers(1, 40))
        ef = int(rng.integers(4, 25))
        expand = int(rng.integers(1, 7))
        patience = int(rng.integers(1, 16))
        mi = int(rng.integers(1, 8))
        metric = [Metric.L2, Metric.COSINE, Metric.INNER_PRODUCT][trial]
        xfer = ["dma", "scalar"][trial % 2]
        r_ent = int(rng.integers(1, min(6, ef) + 1))

        def grid(shape):
            v = rng.integers(-4, 5, shape).astype(np.float32) / 4.0
            v[np.abs(v).sum(axis=-1) == 0, 0] = 1.0
            return v

        vecs = grid((cap, d))
        v16 = jnp.asarray(vecs, jnp.bfloat16)
        nbrs = jnp.asarray(
            rng.integers(-1, cap, (cap, r0)).astype(np.int32)
        )
        q = jnp.asarray(grid((b, d)))
        entries = rng.integers(0, cap, (b, r_ent)).astype(np.int32)
        entries[rng.random((b, r_ent)) < 0.1] = -1
        entries = jnp.asarray(entries)

        packed = v16[jnp.maximum(nbrs, 0)]
        xd, xi = _beam_search_level0(
            q, entries, v16, nbrs, metric, ef, expand,
            max_iters=mi, patience=patience, packed=packed,
            fused=True, interpret=True,
        )
        e_d = gathered_distances(
            q, v16[jnp.maximum(entries, 0)].astype(jnp.float32), metric
        )
        e_d = jnp.where(entries >= 0, e_d, jnp.inf)
        init_d = jnp.full((b, ef), jnp.inf).at[:, :r_ent].set(e_d)
        init_i = jnp.full((b, ef), -1, jnp.int32).at[:, :r_ent].set(entries)
        wd, wi = beam_loop(
            q, init_d, init_i, pack_wide(v16, nbrs), metric=metric,
            ef=ef, expand=expand, patience=patience, max_iters=mi,
            interpret=True, pick_xfer=xfer,
        )
        np.testing.assert_array_equal(np.asarray(xi), np.asarray(wi))
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(xd), posinf=1e38),
            np.nan_to_num(np.asarray(wd), posinf=1e38),
            rtol=1e-6, atol=1e-6,
        )


def test_whole_path_respects_deletes(built_index):
    idx, q, _ = built_index
    # soft-delete a swath and make sure the whole path never returns it
    victims = np.arange(100, 200, dtype=np.int64)
    idx.delete(victims)
    idx.beam_whole = "force"
    idx.search_bf16 = True
    idx.exact_small_n = 0
    try:
        ids, _ = idx.search(q, k=10, ef_search=32)
    finally:
        idx.beam_whole = False
        idx.search_bf16 = jax.default_backend() == "tpu"
        idx.exact_small_n = 8192
    assert not (set(ids.reshape(-1).tolist()) & set(victims.tolist()))
