"""Node2Vec: walk statistics and embedding quality (the reference tests
via pytests/test_node2vec.py: trains on small graphs and checks
embedding sanity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from muninn_tpu.graph import Graph
from muninn_tpu.models.node2vec import (
    _row_sorted_cumw,
    biased_walks,
    build_negative_table,
    node2vec_train,
)
from muninn_tpu.index.flat import FlatIndex


def line_graph(n=6):
    src = [f"v{i}" for i in range(n - 1)]
    dst = [f"v{i+1}" for i in range(n - 1)]
    return Graph.from_edges(src, dst)


def two_cliques(k=8):
    edges = []
    for base in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((f"v{base+i}", f"v{base+j}"))
    edges.append((f"v0", f"v{k}"))
    src, dst = zip(*edges)
    return Graph.from_edges(src, dst)


def _walk_arrays(g):
    c = g.csr("both")
    off = np.asarray(c.offsets)
    dst = np.asarray(c.dst)
    w = np.asarray(c.weights)
    order = np.lexsort((dst, np.asarray(c.src)))
    dst, w = dst[order], w[order]
    cumw = np.cumsum(w, dtype=np.float64).astype(np.float32)
    return jnp.asarray(off), jnp.asarray(dst), jnp.asarray(cumw)


def test_walks_follow_edges(rng):
    g = two_cliques()
    off, dst, cumw = _walk_arrays(g)
    starts = jnp.arange(g.num_nodes, dtype=jnp.int32)
    walks = np.asarray(
        biased_walks(jax.random.PRNGKey(0), off, dst, cumw, starts,
                     g.num_nodes, 10, 1.0, 1.0)
    )
    assert walks.shape == (g.num_nodes, 11)
    # every consecutive pair is a real edge
    edge_set = set()
    offn, dstn = np.asarray(off), np.asarray(dst)
    for v in range(g.num_nodes):
        for e in range(offn[v], offn[v + 1]):
            edge_set.add((v, int(dstn[e])))
    for row in walks:
        for a, b in zip(row, row[1:]):
            assert (int(a), int(b)) in edge_set


def test_walks_p_bias_controls_backtracking(rng):
    g = line_graph(30)
    off, dst, cumw = _walk_arrays(g)
    starts = jnp.full((2000,), 15, jnp.int32)

    def backtrack_rate(p, q, seed):
        w = np.asarray(
            biased_walks(jax.random.PRNGKey(seed), off, dst, cumw, starts,
                         g.num_nodes, 8, p, q)
        )
        bt = (w[:, 2:] == w[:, :-2]).mean()
        return bt

    low_p = backtrack_rate(0.25, 1.0, 1)   # 1/p high -> backtrack often
    high_p = backtrack_rate(4.0, 1.0, 1)   # 1/p low  -> avoid backtrack
    assert low_p > high_p + 0.1, (low_p, high_p)


def test_negative_table_proportional(rng):
    deg = np.array([1, 10, 100], np.float64)
    table = build_negative_table(deg, size=10000)
    counts = np.bincount(table, minlength=3).astype(float)
    # ratios ~ deg^0.75
    want = deg ** 0.75
    want = want / want.sum()
    got = counts / counts.sum()
    np.testing.assert_allclose(got, want, atol=0.02)


def test_node2vec_separates_cliques(rng):
    g = two_cliques(8)
    ids, emb = node2vec_train(
        g, dim=16, num_walks=6, walk_length=12, window=4,
        neg_samples=4, epochs=4, seed=2, walk_batch=64, sgns_chunk=64,
    )
    idx = {n: i for i, n in enumerate(ids)}
    a = [idx[f"v{i}"] for i in range(8)]
    b = [idx[f"v{i}"] for i in range(8, 16)]
    sims = emb @ emb.T
    intra = (sims[np.ix_(a, a)].mean() + sims[np.ix_(b, b)].mean()) / 2
    inter = sims[np.ix_(a, b)].mean()
    assert intra > inter + 0.1, (intra, inter)
    # embeddings are unit-norm
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)


def test_node2vec_writes_to_index(rng):
    g = two_cliques(6)
    out = FlatIndex(8, "cosine", use_pallas=False)
    ids, emb = node2vec_train(
        g, dim=8, num_walks=3, walk_length=8, epochs=2, seed=4,
        walk_batch=32, sgns_chunk=32, output_index=out,
    )
    assert len(out) == g.num_nodes
    # searching an embedding finds its own row (rowid = i+1)
    got, _ = out.search(emb[0], k=1)
    assert got[0] == 1


def test_node2vec_dim_cap():
    g = line_graph(4)
    with pytest.raises(ValueError):
        node2vec_train(g, dim=2048)


def test_row_sorted_cumw_is_row_local(rng):
    """Per-row prefix sums reset at row starts and rows come out
    dst-sorted — the f32-at-any-scale contract (a global cumsum loses
    unit-weight resolution past 2^24 total weight)."""
    import jax.numpy as jnp

    from muninn_tpu.graph import Graph
    from muninn_tpu.models.node2vec import _row_sorted_cumw

    n, e = 50, 400
    s = rng.integers(0, n, e)
    d = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32) + 0.1
    g = Graph.from_edges(s, d, w)
    c = g.csr("both")
    dst_sorted, cumw = _row_sorted_cumw(
        c.src, c.dst, c.weights, c.offsets, c.max_deg
    )
    off = np.asarray(c.offsets)
    ds = np.asarray(dst_sorted)
    cw = np.asarray(cumw)
    hs, hd, hw = g.host_coo("both")
    for v in range(n):
        lo, hi = off[v], off[v + 1]
        if hi == lo:
            continue
        row = ds[lo:hi]
        assert (np.diff(row) >= 0).all()  # dst ascending within row
        want = np.sort(hw[hs == v].astype(np.float64))
        got = np.sort(np.diff(np.concatenate([[0.0], cw[lo:hi]])))
        # rtol bounds f32 rounding of the shift-doubling sum tree;
        # the guarded failure mode (a GLOBAL cumsum losing unit-weight
        # resolution past 2^24) errs at ~1.0 — four orders above this
        np.testing.assert_allclose(got, want, rtol=1e-4)
        # row-local: first entry is its own weight, not a running total
        assert cw[lo] <= hw[hs == v].max() + 1e-6


def test_negative_table_covers_all_nodes_beyond_size():
    """V > table size must still sample the whole id range (the old
    repeat-truncate build kept only ids < size, silently skewing every
    embedding on 100k+-node graphs)."""
    from muninn_tpu.models.node2vec import build_negative_table

    v = 5000
    tab = build_negative_table(np.ones(v), size=1000)
    assert tab.shape == (1000,)
    assert tab.min() >= 0 and tab.max() >= v - 10  # tail ids present
    # roughly uniform coverage for uniform degrees
    assert len(np.unique(tab // 500)) == 10
    # degree-proportional bias: heavy node drawn far more often
    deg = np.ones(100)
    deg[7] = 1000.0
    tab2 = build_negative_table(deg, size=1000)
    assert (tab2 == 7).mean() > 0.2


def test_weighted_draw_matches_edge_weights_exactly():
    """At p=q=1 the walk's next-step distribution from a hub must equal
    edge weight / total weight — validates the row-local cumw
    searchsorted sampler end-to-end (a 40k-draw campaign measured max
    relative error 2.2%, i.e. sampling noise)."""
    import jax

    from muninn_tpu.graph.api import Graph

    src = ["h"] * 9 + [f"n{i}" for i in range(1, 10)]
    dst = [f"n{i}" for i in range(1, 10)] + ["h"] * 9
    w = np.concatenate(
        [np.arange(1, 10, dtype=np.float32), np.ones(9, np.float32)])
    g = Graph.from_edges(src, dst, w)
    c = g.csr()
    hub = g.node_index("h")
    dstj, cumw = _row_sorted_cumw(
        c.src, c.dst, c.weights, c.offsets, c.max_deg
    )
    starts = jnp.full((2048,), hub, jnp.int32)
    counts = np.zeros(g.num_nodes)
    for rep in range(5):
        walks = biased_walks(jax.random.PRNGKey(rep), c.offsets, dstj,
                             cumw, starts, g.num_nodes, 1, 1.0, 1.0)
        for t in np.asarray(walks)[:, 1]:
            if t != hub:
                counts[t] += 1
    tot = 45.0
    n_draws = counts.sum()
    assert n_draws == 5 * 2048  # hub has neighbors: no in-place repeats
    for i in range(1, 10):
        emp = counts[g.node_index(f"n{i}")] / n_draws
        exp = i / tot
        assert abs(emp - exp) < 0.015 + 0.25 * exp, (i, emp, exp)
