"""Host(C++) vs device(XLA) graph-analytics agreement soak on random
graphs: bfs / dfs reachability / shortest_path / components / pagerank /
betweenness / closeness, weighted + unweighted, directed semantics as
exposed. Host is the independently-implemented C++ engine, device the
JAX kernels — agreement is a strong correctness oracle for both."""
import sys, time, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.graph.api import Graph

n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 15
rng = np.random.default_rng(5)
fails = 0
t0 = time.time()
for trial in range(n_trials):
    v = int(rng.integers(5, 60))
    e = int(rng.integers(v, 5 * v))
    weighted = bool(rng.random() < 0.5)
    src = rng.integers(0, v, e)
    dst = rng.integers(0, v, e)
    names = [f"n{i}" for i in range(v)]
    s = [names[i] for i in src]
    d = [names[i] for i in dst]
    w = rng.uniform(0.1, 5.0, e).astype(np.float32) if weighted else None
    tag = f"trial={trial} v={v} e={e} weighted={weighted}"
    try:
        g = Graph.from_edges(s, d, weights=w)
        start = names[int(rng.integers(0, v))]

        bh = {n: dep for n, dep, _p in g.bfs(start, backend="host")}
        bd = {n: dep for n, dep, _p in g.bfs(start, backend="device")}
        assert bh == bd, ("bfs", {k: (bh.get(k), bd.get(k))
                                  for k in set(bh) | set(bd)
                                  if bh.get(k) != bd.get(k)})

        ch = g.connected_components(backend="host")
        cd = g.connected_components(backend="device")
        # labels may differ; partition must match ({node: (cid, size)})
        def part(m):
            comp = {}
            for n, (cid, _sz) in m.items():
                comp.setdefault(cid, set()).add(n)
            return sorted(frozenset(x) for x in comp.values())
        assert part(ch) == part(cd), "components partition"
        # reported sizes must match membership
        for m in (ch, cd):
            by = {}
            for n, (cid, sz) in m.items():
                by.setdefault(cid, set()).add(n)
                assert len(by[cid]) <= sz
            for n, (cid, sz) in m.items():
                assert len(by[cid]) == sz, "component size"

        ph = g.pagerank(backend="host")
        pd = g.pagerank(backend="device")
        assert set(ph) == set(pd)
        for n in ph:
            assert abs(ph[n] - pd[n]) < 1e-3, ("pagerank", n, ph[n], pd[n])

        end = names[int(rng.integers(0, v))]
        try:
            path_h, dist_h = g.shortest_path(start, end, backend="host")
        except Exception:
            path_h = None
        try:
            path_d, dist_d = g.shortest_path(start, end, backend="device")
        except Exception:
            path_d = None
        if (path_h is None) != (path_d is None):
            raise AssertionError(f"sp reachability disagrees {path_h} {path_d}")
        if path_h is not None:
            import math
            both_inf = math.isinf(dist_h) and math.isinf(dist_d)
            assert both_inf or abs(dist_h - dist_d) < 1e-3, (
                "sp dist", dist_h, dist_d)

        beth = g.betweenness(backend="host")
        betd = g.betweenness(backend="device")
        for n in beth:
            assert abs(beth[n] - betd[n]) < 1e-2 * max(1.0, abs(beth[n])), (
                "betweenness", n, beth[n], betd[n])

        clh = g.closeness(backend="host")
        cld = g.closeness(backend="device")
        for n in clh:
            assert abs(clh[n] - cld[n]) < 1e-3, ("closeness", n, clh[n], cld[n])

        print(f"ok {tag} ({time.time()-t0:.0f}s)", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()
print(f"done: {n_trials} trials, {fails} failures", flush=True)
