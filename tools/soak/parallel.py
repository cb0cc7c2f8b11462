"""Randomized campaign over the multi-chip parallel layer on the
virtual CPU mesh: sharded exact search / IVF / HNSW / PageRank /
components / multi-source BFS / multihost (DCN x ICI) search+PageRank,
each against an independent host oracle — plus shard-count invariance
(the same call on a 1-device mesh) where the algorithm guarantees it.

Randomizes mesh size, corpus/graph shapes, validity masks, metrics,
pad tails, and seed placement. Usage: python tools/soak/parallel.py [trials]
"""
import os
import sys
import time
import traceback

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.graph.api import Graph
from muninn_tpu.ops.distance import Metric
from muninn_tpu.parallel import (
    make_mesh,
    make_mesh2,
    multihost_exact_search,
    shard_ivf,
    shard_hnsw,
    shard_rows,
    shard_rows2,
    sharded_bfs_depths,
    sharded_components,
    sharded_exact_search,
    sharded_pagerank,
)

METRICS = [Metric.L2, Metric.COSINE, Metric.INNER_PRODUCT]


def _oracle_dists(q, c, metric):
    if metric is Metric.L2:
        return ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    if metric is Metric.INNER_PRODUCT:
        return -(q @ c.T)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
    return 1.0 - qn @ cn.T


def t_exact_search(rng, mesh, nsh):
    n = int(rng.integers(1, 40)) * nsh
    d = int(rng.integers(3, 48))
    b = int(rng.integers(1, 24))
    k = int(rng.integers(1, 12))
    metric = METRICS[int(rng.integers(0, 3))]
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    valid = rng.random(n) < 0.85
    sd, si = sharded_exact_search(
        jnp.asarray(queries), shard_rows(jnp.asarray(corpus), mesh),
        shard_rows(jnp.asarray(valid), mesh), k, metric, mesh,
    )
    sd, si = np.asarray(sd), np.asarray(si)
    dist = _oracle_dists(queries, corpus, metric)
    dist[:, ~valid] = np.inf
    order = np.argsort(dist, axis=1, kind="stable")[:, :k]
    want_d = np.take_along_axis(dist, order, axis=1)
    live = int(valid.sum())
    for r in range(b):
        width = min(k, live)
        np.testing.assert_allclose(
            sd[r, :width], want_d[r, :width], rtol=2e-3, atol=2e-3)
        # id agreement up to distance ties: returned ids must reproduce
        # the oracle distances
        got = dist[r, np.maximum(si[r, :width], 0)]
        np.testing.assert_allclose(
            got, want_d[r, :width], rtol=2e-3, atol=2e-3)
        assert (si[r, width:] == -1).all() or not np.isfinite(
            sd[r, width:]).any()


def t_ivf_invariance(rng, mesh, nsh):
    from muninn_tpu.index.ivf import IvfIndex

    d = int(rng.integers(2, 8)) * 4
    n = int(rng.integers(300, 1200))
    ncent = int(rng.integers(5, 25))
    centers = rng.standard_normal((ncent, d)).astype(np.float32) * 3
    x = (centers[rng.integers(0, ncent, n)]
         + rng.standard_normal((n, d)).astype(np.float32))
    metric = ["cosine", "l2"][int(rng.integers(0, 2))]
    idx = IvfIndex(d, metric, cluster_size=32,
                   nprobe=int(rng.integers(2, 9)), seed=int(rng.integers(99)),
                   capacity=n + 64)
    idx.insert(np.arange(n), x)
    idx.rebuild()
    ndel = int(rng.integers(0, n // 5))
    if ndel:
        idx.delete(rng.choice(n, ndel, replace=False))
    q = (centers[rng.integers(0, ncent, 16)]
         + rng.standard_normal((16, d)).astype(np.float32))
    k = int(rng.integers(1, 12))

    dm, im = shard_ivf(idx, mesh)(q, k=k)
    d1, i1 = shard_ivf(idx, make_mesh(1))(q, k=k)
    np.testing.assert_array_equal(np.asarray(im), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(dm), np.asarray(d1),
                               rtol=1e-3, atol=1e-4)
    # deleted/invalid slots never surface
    live_slots = set(np.flatnonzero(np.asarray(idx.store.valid)).tolist())
    got = set(np.asarray(im).reshape(-1).tolist()) - {-1}
    assert got <= live_slots, got - live_slots


def t_pagerank(rng, mesh, nsh):
    n = int(rng.integers(8, 150))
    e = int(rng.integers(n, 6 * n))
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = Graph.from_edges(src.tolist(), dst.tolist())
    want = g.pagerank(iterations=25)
    c = g.csr("forward")
    deg = np.asarray(c.degrees()).astype(np.float32)
    s, d, _ = c.host_coo()
    share = (1.0 / np.maximum(deg, 1e-30))[s]
    pad = (-len(s)) % nsh
    s = np.pad(s, (0, pad))
    d = np.pad(d, (0, pad))
    share = np.pad(share, (0, pad)).astype(np.float32)
    rank = np.asarray(sharded_pagerank(
        shard_rows(jnp.asarray(s), mesh),
        shard_rows(jnp.asarray(d), mesh),
        shard_rows(jnp.asarray(share), mesh),
        jnp.asarray(deg <= 0), g.num_nodes, mesh, iterations=25,
    ))
    for i in range(g.num_nodes):
        w = want[g.nodes.id_of(i)]
        assert abs(rank[i] - w) < 1e-4, (i, rank[i], w)


def t_components(rng, mesh, nsh):
    v = int(rng.integers(8, 150))
    e = int(rng.integers(2, 4 * v))
    src = rng.integers(0, v, e).astype(np.int32)
    dst = rng.integers(0, v, e).astype(np.int32)
    parent = list(range(v))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    pad = (-e) % nsh
    sp = np.pad(src, (0, pad), constant_values=v)
    dp = np.pad(dst, (0, pad), constant_values=v)
    labels = np.asarray(sharded_components(
        shard_rows(jnp.asarray(sp), mesh),
        shard_rows(jnp.asarray(dp), mesh), v, mesh, max_iters=v,
    ))
    groups = {}
    for node in range(v):
        groups.setdefault(find(node), set()).add(int(labels[node]))
    for root, ls in groups.items():
        assert len(ls) == 1, (root, ls)
    assert len({next(iter(ls)) for ls in groups.values()}) == len(groups)


def t_bfs(rng, mesh, nsh):
    from collections import deque

    v = int(rng.integers(8, 120))
    e = int(rng.integers(v, 5 * v))
    src = rng.integers(0, v, e).astype(np.int32)
    dst = rng.integers(0, v, e).astype(np.int32)
    nseeds = int(rng.integers(1, 4))
    seeds = rng.choice(v, nseeds, replace=False).astype(np.int32)
    adj = {}
    for s, t in zip(src, dst):
        adj.setdefault(int(s), []).append(int(t))
    want = np.full(v, 2 ** 30, np.int64)
    dq = deque()
    for s in seeds:
        want[s] = 0
        dq.append(int(s))
    while dq:
        u = dq.popleft()
        for t in adj.get(u, []):
            if want[t] > want[u] + 1:
                want[t] = want[u] + 1
                dq.append(t)
    pad = (-e) % nsh
    sp = np.pad(src, (0, pad), constant_values=v)
    dp = np.pad(dst, (0, pad), constant_values=v)
    got = np.asarray(sharded_bfs_depths(
        shard_rows(jnp.asarray(sp), mesh),
        shard_rows(jnp.asarray(dp), mesh),
        jnp.asarray(seeds), v, mesh, max_iters=v,
    ))
    np.testing.assert_array_equal(got, want)


def t_multihost_search(rng, _mesh, _nsh):
    hosts, chips = [(2, 4), (4, 2), (2, 2), (1, 4)][int(rng.integers(0, 4))]
    mesh = make_mesh2(hosts, chips)
    per = hosts * chips
    n = int(rng.integers(1, 30)) * per
    d = int(rng.integers(3, 40))
    b = int(rng.integers(1, 16))
    k = int(rng.integers(1, 8))
    metric = ["l2", "cosine", "inner_product"][int(rng.integers(0, 3))]
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    valid = rng.random(n) < 0.9
    sd, si = multihost_exact_search(
        jnp.asarray(queries), shard_rows2(jnp.asarray(corpus), mesh),
        shard_rows2(jnp.asarray(valid), mesh), k, metric, mesh,
    )
    sd, si = np.asarray(sd), np.asarray(si)
    dist = _oracle_dists(queries, corpus, Metric(metric) if not isinstance(
        metric, Metric) else metric)
    dist[:, ~valid] = np.inf
    order = np.argsort(dist, axis=1, kind="stable")[:, :k]
    want_d = np.take_along_axis(dist, order, axis=1)
    width = min(k, int(valid.sum()))
    for r in range(b):
        np.testing.assert_allclose(
            sd[r, :width], want_d[r, :width], rtol=2e-3, atol=2e-3)
        got = dist[r, np.maximum(si[r, :width], 0)]
        np.testing.assert_allclose(
            got, want_d[r, :width], rtol=2e-3, atol=2e-3)


def t_hnsw(rng, mesh, nsh):
    from muninn_tpu.index.hnsw import HnswIndex

    d = int(rng.integers(4, 12)) * 4
    n = nsh * int(rng.integers(40, 200))
    ncent = int(rng.integers(8, 30))
    centers = rng.standard_normal((ncent, d)).astype(np.float32)
    x = centers[rng.integers(0, ncent, n)] + 0.25 * rng.standard_normal(
        (n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    per = n // nsh
    indexes = []
    for s in range(nsh):
        ix = HnswIndex(d, "cosine", m=8, ef_construction=48,
                       wave_size=2048, capacity=per + 32)
        ix.insert(np.arange(per) + 10_000 * (s + 1),
                  x[s * per:(s + 1) * per])
        indexes.append(ix)
    q = x[rng.integers(0, n, 16)] + 0.03 * rng.standard_normal(
        (16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k = int(rng.integers(1, 9))
    gd, ids = shard_hnsw(indexes, mesh)(q, k=k, ef_search=32)
    assert gd.shape == ids.shape == (16, k)
    assert (np.diff(gd, axis=1) >= -1e-5).all()
    ext = np.concatenate([np.arange(per) + 10_000 * (s + 1)
                          for s in range(nsh)])
    sims = q @ x.T
    want = ext[np.argsort(-sims, axis=1)[:, :k]]
    hits = sum(len(set(a[a >= 0].tolist()) & set(b.tolist()))
               for a, b in zip(ids, want))
    assert hits / (16 * k) >= 0.85, hits / (16 * k)


SURFACES = [t_exact_search, t_ivf_invariance, t_pagerank, t_components,
            t_bfs, t_multihost_search, t_hnsw]

if __name__ == "__main__":
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    rng = np.random.default_rng(17)
    fails = 0
    t0 = time.time()
    for trial in range(n_trials):
        fn = SURFACES[trial % len(SURFACES)]
        nsh = [1, 2, 4, 8][int(rng.integers(0, 4))]
        mesh = make_mesh(nsh)
        tag = f"trial={trial} surface={fn.__name__} nsh={nsh}"
        try:
            fn(rng, mesh, nsh)
            print(f"ok   {tag}", flush=True)
        except Exception:
            fails += 1
            print(f"FAIL {tag}", flush=True)
            traceback.print_exc()
    print(f"{n_trials} trials, {fails} failures, "
          f"{time.time() - t0:.1f}s", flush=True)
    sys.exit(1 if fails else 0)
