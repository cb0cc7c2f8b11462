"""Cross-backend agreement: native host kernels vs device kernels.

The small-graph fast path (``native/src/muninn_graph.cpp``) must
produce the same results as the device fixpoint kernels — same parent
tie-breaks, same epsilon rules, same PageRank formula — because 'auto'
routing switches silently on graph size.
"""

import numpy as np
import pytest

from muninn_tpu import native
from muninn_tpu.graph import Graph

pytestmark = pytest.mark.skipif(
    not native.graph_available(), reason="native graph kernels unavailable"
)


@pytest.fixture
def g(rng):
    n, e = 120, 600
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = src != dst
    w = rng.uniform(0.5, 2.0, keep.sum()).astype(np.float32)
    return Graph.from_edges(
        [f"n{s}" for s in src[keep]], [f"n{d}" for d in dst[keep]], w
    )


def _start(g):
    return g.nodes.id_of(0)


def test_bfs_agreement(g):
    for direction in ("forward", "reverse", "both"):
        h = g.bfs(_start(g), direction=direction, backend="host")
        d = g.bfs(_start(g), direction=direction, backend="device")
        assert h == d


def test_bfs_max_depth_agreement(g):
    h = g.bfs(_start(g), max_depth=2, backend="host")
    d = g.bfs(_start(g), max_depth=2, backend="device")
    assert h == d


def test_shortest_path_agreement(g):
    ids = [g.nodes.id_of(i) for i in range(0, g.num_nodes, 7)]
    for t in ids[1:6]:
        for weighted in (False, True):
            ph, dh = g.shortest_path(
                _start(g), t, weighted=weighted, backend="host"
            )
            pd, dd = g.shortest_path(
                _start(g), t, weighted=weighted, backend="device"
            )
            assert np.isclose(dh, dd, rtol=1e-5, atol=1e-5) or (
                dh == dd == float("inf")
            )
            # both must be valid optimal paths (parents may differ only
            # within fp ties; assert cost equality through the graph)
            if ph:
                assert ph[0] == _start(g) and ph[-1] == t
                assert pd[0] == _start(g) and pd[-1] == t


def test_components_agreement(g):
    assert g.connected_components(backend="host") == g.connected_components(
        backend="device"
    )


def test_pagerank_agreement(g):
    for weighted in (False, True):
        for direction in ("forward", "both"):
            h = g.pagerank(weighted=weighted, direction=direction,
                           backend="host")
            d = g.pagerank(weighted=weighted, direction=direction,
                           backend="device")
            hv = np.array([h[k] for k in sorted(h)])
            dv = np.array([d[k] for k in sorted(d)])
            np.testing.assert_allclose(hv, dv, rtol=2e-4, atol=1e-7)


def test_betweenness_agreement(g):
    for weighted in (False, True):
        for direction in ("both", "forward"):
            h = g.betweenness(weighted=weighted, direction=direction,
                              backend="host")
            d = g.betweenness(weighted=weighted, direction=direction,
                              backend="device")
            hv = np.array([h[k] for k in sorted(h)])
            dv = np.array([d[k] for k in sorted(d)])
            np.testing.assert_allclose(hv, dv, rtol=1e-3, atol=1e-3)


def test_edge_betweenness_agreement(g):
    h = g.edge_betweenness(backend="host")
    d = g.edge_betweenness(backend="device")
    assert set(h) == set(d)
    hv = np.array([h[k] for k in sorted(h)])
    dv = np.array([d[k] for k in sorted(d)])
    np.testing.assert_allclose(hv, dv, rtol=1e-3, atol=1e-3)


def test_betweenness_sampled_agreement(g):
    h = g.betweenness(sample_sources=16, seed=3, backend="host")
    d = g.betweenness(sample_sources=16, seed=3, backend="device")
    hv = np.array([h[k] for k in sorted(h)])
    dv = np.array([d[k] for k in sorted(d)])
    np.testing.assert_allclose(hv, dv, rtol=1e-3, atol=1e-3)


def test_closeness_agreement(g):
    for weighted in (False, True):
        for normalized in (False, True):
            h = g.closeness(weighted=weighted, normalized=normalized,
                            backend="host")
            d = g.closeness(weighted=weighted, normalized=normalized,
                            backend="device")
            hv = np.array([h[k] for k in sorted(h)])
            dv = np.array([d[k] for k in sorted(d)])
            np.testing.assert_allclose(hv, dv, rtol=1e-4, atol=1e-5)


def test_leiden_host_quality_and_determinism(rng):
    # planted partition: 6 blocks of 40, dense intra / sparse inter
    blocks, size = 6, 40
    n = blocks * size
    src, dst = [], []
    for b in range(blocks):
        for _ in range(size * 8):
            u, v = rng.integers(b * size, (b + 1) * size, 2)
            if u != v:
                src.append(u); dst.append(v)
    for _ in range(n // 2):
        u, v = rng.integers(0, n, 2)
        if u != v:
            src.append(u); dst.append(v)
    g = Graph.from_edges([f"n{s}" for s in src], [f"n{d}" for d in dst])
    labels_h, q_h = g.leiden(seed=0, backend="host")
    labels_h2, q_h2 = g.leiden(seed=0, backend="host")
    assert labels_h == labels_h2 and q_h == q_h2  # deterministic
    _, q_d = g.leiden(seed=0, backend="device")
    # host sequential moving should match or beat the synchronous device
    # sweeps on quality (both must find the planted structure)
    assert q_h >= 0.5
    assert q_h >= q_d - 0.05
    # planted blocks recovered: most frequent label per block dominates
    for b in range(blocks):
        blk = [labels_h[f"n{i}"] for i in range(b * size, (b + 1) * size)
               if f"n{i}" in labels_h]
        top = max(blk.count(x) for x in set(blk))
        assert top / len(blk) > 0.8


def test_modularity_consistency(g):
    labels, q = g.leiden(seed=0, backend="host")
    assert np.isclose(g.modularity(labels), q, atol=1e-5)


def test_auto_routes_small_to_host(g, monkeypatch):
    # a tiny graph must not touch the device: poison the device CSR path
    import muninn_tpu.graph.core as core

    def boom(*a, **k):
        raise AssertionError("device CSR built for a small-graph op")

    monkeypatch.setattr(type(g), "csr", boom)
    g.bfs(_start(g))
    g.pagerank()
    g.connected_components()
    g.betweenness()
    g.closeness()
    g.leiden()
    g.shortest_path(_start(g), g.nodes.id_of(1))


def test_reference_envelope_routes_host(monkeypatch):
    """Every analytic at the reference's LARGEST published point (10k
    nodes, ER-5) must route to the host engine: the device path hangs
    when the TPU tunnel is down and is 100-1000x slower at this scale
    regardless. Regression for the unweighted-closeness cost constant
    (the weighted 95 ns/src-edge estimate routed 10k all-source
    closeness to the device: 95 s estimated vs ~4 s actual)."""
    from muninn_tpu.graph import Graph
    import muninn_tpu.graph.routing as routing

    rng = np.random.default_rng(5)
    n, e = 10_000, 50_000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = Graph.from_edges(src.tolist(), dst.tolist())

    decisions = []
    orig = routing.use_host

    def spy(backend, host_seconds):
        r = orig(backend, host_seconds)
        decisions.append((backend, host_seconds, r))
        return r

    monkeypatch.setattr(routing, "use_host", spy)
    # the modules import `use_host` by name — patch those bindings too
    import muninn_tpu.graph.api as api
    import muninn_tpu.graph.centrality as ctr
    import muninn_tpu.graph.community as cmty
    for mod in (api, ctr, cmty):
        if hasattr(mod, "use_host"):
            monkeypatch.setattr(mod, "use_host", spy)

    s = int(src[0])
    g.bfs(s)
    g.pagerank()
    g.connected_components()
    g.shortest_path(s, int(dst[-1]))
    g.betweenness(sample_sources=64)
    g.closeness()           # unweighted int32-BFS specialization
    g.leiden(seed=0)
    assert decisions, "routing spy never consulted"
    routed_device = [d for d in decisions if d[0] == "auto" and not d[2]]
    assert not routed_device, routed_device


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_randomized_topology_agreement(seed):
    """Random graphs of varying density/size (incl. multi-edges and
    self-loops as generated): host and device backends agree on every
    analytic. Broad-topology insurance behind the fixed-graph agreement
    tests above (a 40-graph soak of this property ran clean; this keeps
    three representatives in CI)."""
    r = np.random.default_rng(seed)
    v = int(r.integers(8, 50))
    e = int(r.integers(v, 5 * v))
    src = r.integers(0, v, e)
    dst = r.integers(0, v, e)
    w = r.uniform(0.1, 5.0, e).astype(np.float32) if seed % 2 else None
    g = Graph.from_edges([f"n{s}" for s in src], [f"n{d}" for d in dst], w)
    start = f"n{src[0]}"

    bh = {n: dep for n, dep, _p in g.bfs(start, backend="host")}
    bd = {n: dep for n, dep, _p in g.bfs(start, backend="device")}
    assert bh == bd

    ch, cd = (g.connected_components(backend=b) for b in ("host", "device"))
    def part(m):
        comp = {}
        for n, (cid, _sz) in m.items():
            comp.setdefault(cid, set()).add(n)
        return sorted(map(frozenset, comp.values()), key=sorted)
    assert part(ch) == part(cd)

    ph, pd = (g.pagerank(backend=b) for b in ("host", "device"))
    assert set(ph) == set(pd)
    assert all(abs(ph[n] - pd[n]) < 1e-3 for n in ph)

    end = f"n{dst[-1]}"
    sph = g.shortest_path(start, end, backend="host")
    spd = g.shortest_path(start, end, backend="device")
    if sph is None or np.isinf(sph[1]):
        assert spd is None or np.isinf(spd[1])
    else:
        assert abs(sph[1] - spd[1]) < 1e-3

    beth, betd = (g.betweenness(backend=b) for b in ("host", "device"))
    assert all(
        abs(beth[n] - betd[n]) < 1e-2 * max(1.0, abs(beth[n])) for n in beth
    )
    clh, cld = (g.closeness(backend=b) for b in ("host", "device"))
    assert all(abs(clh[n] - cld[n]) < 1e-3 for n in clh)
