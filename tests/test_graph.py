"""Graph analytics vs networkx oracle (the reference compares TVF
output against known values; we use networkx the same way)."""

import numpy as np
import networkx as nx
import pytest

from muninn_tpu.graph import Graph


def random_graph(rng, n=60, p=0.08, directed=True, weighted=False, seed=1):
    g = nx.gnp_random_graph(n, p, seed=seed, directed=directed)
    src = [f"n{u}" for u, v in g.edges()]
    dst = [f"n{v}" for u, v in g.edges()]
    w = None
    if weighted:
        w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
        for (u, v), wt in zip(g.edges(), w):
            g[u][v]["weight"] = float(wt)
    return Graph.from_edges(src, dst, w), g


def test_bfs_depths_match_networkx(rng):
    mg, g = random_graph(rng, n=40, p=0.1)
    src0 = next(iter(g.nodes()))
    rows = mg.bfs(f"n{src0}", direction="forward")
    want = nx.single_source_shortest_path_length(g, src0)
    got = {n: d for n, d, _ in rows}
    assert got == {f"n{k}": v for k, v in want.items()}


def test_bfs_max_depth(rng):
    mg, g = random_graph(rng, n=40, p=0.1)
    src0 = next(iter(g.nodes()))
    rows = mg.bfs(f"n{src0}", max_depth=2)
    assert all(d <= 2 for _, d, _ in rows)


def test_bfs_parent_is_predecessor(rng):
    mg, g = random_graph(rng, n=40, p=0.1)
    src0 = next(iter(g.nodes()))
    for n, d, p in mg.bfs(f"n{src0}"):
        if p is not None:
            u = int(p[1:]); v = int(n[1:])
            assert g.has_edge(u, v)


def test_dfs_visits_reachable_set(rng):
    mg, g = random_graph(rng, n=40, p=0.1)
    src0 = next(iter(g.nodes()))
    rows = mg.dfs(f"n{src0}")
    want = set(nx.descendants(g, src0)) | {src0}
    assert {int(n[1:]) for n, _, _ in rows} == want
    # depth/parent consistency
    depth = {n: d for n, d, _ in rows}
    for n, d, p in rows:
        if p is not None:
            assert depth[p] == d - 1


def test_shortest_path_unweighted(rng):
    mg, g = random_graph(rng, n=50, p=0.1)
    nodes = list(g.nodes())
    s, t = nodes[0], nodes[-1]
    path, dist = mg.shortest_path(f"n{s}", f"n{t}", weighted=False)
    try:
        want = nx.shortest_path_length(g, s, t)
        assert dist == pytest.approx(want)
        assert len(path) == want + 1
        # path is a real path
        for a, b in zip(path, path[1:]):
            assert g.has_edge(int(a[1:]), int(b[1:]))
    except nx.NetworkXNoPath:
        assert path == [] and np.isinf(dist)


def test_shortest_path_weighted(rng):
    mg, g = random_graph(rng, n=50, p=0.12, weighted=True)
    nodes = list(g.nodes())
    s, t = nodes[1], nodes[-2]
    path, dist = mg.shortest_path(f"n{s}", f"n{t}", weighted=True)
    try:
        want = nx.dijkstra_path_length(g, s, t)
        assert dist == pytest.approx(want, rel=1e-5)
        for a, b in zip(path, path[1:]):
            assert g.has_edge(int(a[1:]), int(b[1:]))
    except nx.NetworkXNoPath:
        assert path == [] and np.isinf(dist)


def test_connected_components(rng):
    mg, g = random_graph(rng, n=60, p=0.03)
    comp = mg.connected_components()
    # edge-list graphs (like the reference's edge tables) have no
    # isolated nodes — drop them from the oracle
    want_sets = [
        s for s in nx.connected_components(g.to_undirected()) if len(s) > 1
        or any(True for _ in g.to_undirected().edges(next(iter(s))))
    ]
    # same partition: two nodes share a component iff networkx says so
    by_id = {}
    for node, (cid, size) in comp.items():
        by_id.setdefault(cid, set()).add(int(node[1:]))
    got_sets = sorted(map(frozenset, by_id.values()), key=min)
    want_sets = sorted(map(frozenset, want_sets), key=min)
    assert got_sets == want_sets
    # sizes correct
    for node, (cid, size) in comp.items():
        assert size == len(by_id[cid])


def test_pagerank_matches_networkx(rng):
    mg, g = random_graph(rng, n=50, p=0.1)
    got = mg.pagerank(damping=0.85, iterations=60)
    want = nx.pagerank(g, alpha=0.85, tol=1e-10)
    for k, v in want.items():
        assert got[f"n{k}"] == pytest.approx(v, abs=2e-4)


def test_degree(rng):
    mg, g = random_graph(rng, n=40, p=0.1, weighted=True)
    out_deg = mg.degree(direction="forward", weighted=True)
    for n in g.nodes():
        want = sum(d["weight"] for _, _, d in g.out_edges(n, data=True))
        assert out_deg[f"n{n}"] == pytest.approx(want, rel=1e-5)
    tot = mg.degree(direction="both", normalized=True)
    for n in g.nodes():
        want = (g.in_degree(n) + g.out_degree(n)) / (g.number_of_nodes() - 1)
        # normalization uses our node count (= nodes appearing in edges)
        want = want * (g.number_of_nodes() - 1) / (mg.num_nodes - 1)
        assert tot[f"n{n}"] == pytest.approx(want, rel=1e-5)


def test_betweenness_undirected_matches_networkx(rng):
    mg, g = random_graph(rng, n=30, p=0.12)
    gu = g.to_undirected()
    got = mg.betweenness(direction="both", normalized=True)
    want = nx.betweenness_centrality(gu, normalized=True)
    for k, v in want.items():
        assert got[f"n{k}"] == pytest.approx(v, abs=1e-4), f"node {k}"


def test_betweenness_directed_matches_networkx(rng):
    mg, g = random_graph(rng, n=25, p=0.12)
    got = mg.betweenness(direction="forward", normalized=True)
    want = nx.betweenness_centrality(g, normalized=True)
    for k, v in want.items():
        assert got[f"n{k}"] == pytest.approx(v, abs=1e-4), f"node {k}"


def test_betweenness_weighted_matches_networkx(rng):
    mg, g = random_graph(rng, n=25, p=0.15, weighted=True)
    got = mg.betweenness(direction="forward", weighted=True, normalized=False)
    want = nx.betweenness_centrality(g, weight="weight", normalized=False)
    for k, v in want.items():
        assert got[f"n{k}"] == pytest.approx(v, abs=1e-3), f"node {k}"


def test_edge_betweenness_matches_networkx(rng):
    mg, g = random_graph(rng, n=25, p=0.12)
    got = mg.edge_betweenness(direction="forward", normalized=False)
    want = nx.edge_betweenness_centrality(g, normalized=False)
    for (u, v), val in want.items():
        assert got[(f"n{u}", f"n{v}")] == pytest.approx(val, abs=1e-3)


def test_closeness_matches_networkx(rng):
    mg, g = random_graph(rng, n=40, p=0.1)
    got = mg.closeness(direction="forward", normalized=True)
    want = nx.closeness_centrality(g)  # incoming distance, WF improved
    for k, v in want.items():
        assert got[f"n{k}"] == pytest.approx(v, abs=1e-4), f"node {k}"


def test_betweenness_sampling_approximates(rng):
    mg, g = random_graph(rng, n=60, p=0.08)
    exact = mg.betweenness(direction="both", normalized=True)
    approx = mg.betweenness(
        direction="both", normalized=True, sample_sources=40, seed=3
    )
    # sampled estimate correlates strongly with exact
    e = np.array([exact[k] for k in sorted(exact)])
    a = np.array([approx[k] for k in sorted(approx)])
    if e.std() > 0 and a.std() > 0:
        r = np.corrcoef(e, a)[0, 1]
        assert r > 0.9


def test_leiden_finds_planted_communities(rng):
    # two dense cliques with one bridge
    edges = []
    for block, base in ((0, 0), (1, 10)):
        for i in range(10):
            for j in range(i + 1, 10):
                edges.append((f"v{base+i}", f"v{base+j}"))
    edges.append(("v0", "v10"))
    src, dst = zip(*edges)
    mg = Graph.from_edges(src, dst)
    labels, q = mg.leiden(seed=1)
    left = {labels[f"v{i}"] for i in range(10)}
    right = {labels[f"v{i}"] for i in range(10, 20)}
    assert len(left) == 1 and len(right) == 1
    assert left != right
    assert q > 0.4


def test_leiden_modularity_reasonable_on_random_modular_graph(rng):
    g = nx.planted_partition_graph(4, 20, 0.6, 0.02, seed=7)
    src = [f"n{u}" for u, v in g.edges()]
    dst = [f"n{v}" for u, v in g.edges()]
    mg = Graph.from_edges(src, dst)
    labels, q = mg.leiden(seed=2)
    # networkx greedy modularity as a baseline to match/beat
    base = nx.algorithms.community.modularity(
        g, nx.algorithms.community.greedy_modularity_communities(g)
    )
    assert q >= base - 0.03, f"leiden Q={q} vs greedy {base}"


def test_temporal_filter(rng):
    src = ["a", "b", "c"]
    dst = ["b", "c", "d"]
    ts = [1.0, 5.0, 9.0]
    mg = Graph.from_edges(src, dst, timestamps=ts, time_start=2, time_end=8)
    assert mg.num_edges == 1
    rows = mg.bfs("b")
    assert {n for n, _, _ in rows} == {"b", "c"}


def test_unknown_node_raises(rng):
    mg = Graph.from_edges(["a"], ["b"])
    with pytest.raises(KeyError):
        mg.bfs("zzz")


def test_closeness_weighted_matches_networkx(rng):
    mg, g = random_graph(rng, n=30, p=0.15, weighted=True)
    got = mg.closeness(direction="forward", weighted=True, normalized=True)
    want = nx.closeness_centrality(g, distance="weight")
    for k, v in want.items():
        assert got[f"n{k}"] == pytest.approx(v, abs=1e-4), f"node {k}"


def test_bfs_reverse_direction(rng):
    mg = Graph.from_edges(["a", "b"], ["b", "c"])
    fwd = {n for n, _, _ in mg.bfs("c", direction="forward")}
    rev = {n for n, _, _ in mg.bfs("c", direction="reverse")}
    assert fwd == {"c"}
    assert rev == {"a", "b", "c"}


def test_pagerank_weighted(rng):
    mg, g = random_graph(rng, n=40, p=0.12, weighted=True)
    got = mg.pagerank(damping=0.85, iterations=60, weighted=True)
    want = nx.pagerank(g, alpha=0.85, weight="weight", tol=1e-10)
    for k, v in want.items():
        assert got[f"n{k}"] == pytest.approx(v, abs=3e-4)


def test_graphcache_churn_differential_representative(rng, tmp_path):
    """Bounded representative of tools/soak/gc_churn.py (300-trial
    campaign ran clean): random interleavings of inserts / deletes /
    lazy reads / explicit rebuilds vs an in-order list oracle with the
    reference's sequential replay semantics (delete removes the FIRST
    live matching occurrence, ``src/graph_csr.c:219-247``); COO storage
    order must match the replay exactly through incremental patches,
    and block-granular save/load must round-trip mid-churn."""
    from muninn_tpu.graph.adjacency import GraphCache

    for seed in (3, 11):
        trng = np.random.default_rng(seed)
        weighted = bool(seed % 2)
        edges = []
        gc = GraphCache(weighted=weighted)
        gc.BLOCK_EDGES = 64
        s0 = trng.integers(0, 50, 120).tolist()
        d0 = trng.integers(0, 50, 120).tolist()
        w0 = (
            trng.uniform(0.5, 2.0, 120).astype(np.float32)
            if weighted else np.ones(120, np.float32)
        )
        gc.add_edges(s0, d0, w0 if weighted else None)
        edges += [
            (a, b, float(w)) for a, b, w in zip(s0, d0, w0.tolist())
        ]
        gc.graph()
        for phase in range(4):
            if trng.random() < 0.7:
                gc.graph().csr("forward")
            if trng.random() < 0.5:
                gc.graph().csr("reverse")
            ins_n = int(trng.integers(2, 12))
            si = trng.integers(0, 58, ins_n).tolist()  # some new nodes
            di = trng.integers(0, 58, ins_n).tolist()
            wi = (
                trng.uniform(0.5, 2.0, ins_n).astype(np.float32)
                if weighted else np.ones(ins_n, np.float32)
            )
            gc.add_edges(si, di, wi if weighted else None)
            edges += [
                (a, b, float(w)) for a, b, w in zip(si, di, wi.tolist())
            ]
            kill = [
                edges[int(trng.integers(0, len(edges)))][:2]
                for _ in range(int(trng.integers(1, 10)))
            ] + [(99, 98)]  # plus one nonexistent (no-op)
            gc.remove_edges([k[0] for k in kill], [k[1] for k in kill])
            for s, d in kill:
                for i, e in enumerate(edges):
                    if e[0] == s and e[1] == d:
                        del edges[i]
                        break
            mode = trng.random()
            if mode < 0.4:
                gc.incremental_rebuild()
            elif mode < 0.6:
                gc.rebuild()
            gc.graph()  # lazy path otherwise
            ids = gc.nodes.ids
            got = [
                (ids[s], ids[d], float(w))
                for s, d, w in zip(
                    gc._src.tolist(), gc._dst.tolist(), gc._w.tolist()
                )
            ]
            assert got == edges, f"seed={seed} phase={phase}"
        gc.save(tmp_path / f"churn{seed}")
        gc2 = GraphCache.load(tmp_path / f"churn{seed}")
        ids2 = gc2.nodes.ids
        got2 = [
            (ids2[s], ids2[d], float(w))
            for s, d, w in zip(
                gc2._src.tolist(), gc2._dst.tolist(), gc2._w.tolist()
            )
        ]
        assert got2 == edges, f"seed={seed} reload"


def test_incremental_patch_bit_identical_to_rebuild(rng):
    """Device arrays after an incremental patch must EXACTLY equal the
    arrays a full rebuild would produce (order included) — the host
    mirror / device order invariant the position-based patch relies on."""
    from muninn_tpu.graph.adjacency import GraphCache

    n, e = 200, 3000
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    # parallel duplicates on purpose
    src[50:60] = src[0]
    dst[50:60] = dst[0]
    gc = GraphCache.from_edges(src, dst)
    g = gc.graph()
    for direction in ("forward", "reverse"):
        g.csr(direction)

    ins_s = rng.integers(0, n, 80).astype(np.int64)
    ins_d = rng.integers(0, n, 80).astype(np.int64)
    del_idx = rng.choice(e, 40, replace=False)
    gc.remove_edges(src[del_idx].tolist(), dst[del_idx].tolist())
    gc.add_edges(ins_s.tolist(), ins_d.tolist())
    gc.incremental_rebuild()
    g2 = gc.graph()
    patched = {d: g2.csr(d) for d in ("forward", "reverse")}

    # fresh rebuild from the same host COO
    gc2 = GraphCache.from_edges(
        np.array([gc.nodes.id_of(int(i)) for i in gc._src]),
        np.array([gc.nodes.id_of(int(i)) for i in gc._dst]),
    )
    g3 = gc2.graph()
    for d in ("forward", "reverse"):
        a, b = patched[d], g3.csr(d)
        e_v = a.e_valid
        assert e_v == b.e_valid
        np.testing.assert_array_equal(np.asarray(a.offsets), np.asarray(b.offsets))
        np.testing.assert_array_equal(np.asarray(a.src[:e_v]), np.asarray(b.src[:e_v]))
        np.testing.assert_array_equal(np.asarray(a.dst[:e_v]), np.asarray(b.dst[:e_v]))


def test_device_graph_matches_host_build(rng):
    """Graph.from_device_edges (device-resident COO, device stable-sort
    CSR, identity node table) produces the exact same CSRs and analytics
    as the host-interned path — the constructor for 100M-edge-scale
    graphs where the COO never crosses the host boundary."""
    from muninn_tpu.graph import Graph

    n, e = 400, 2500
    s = rng.integers(0, n, e)
    d = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    gh = Graph.from_edges(s, d, w)
    gd = Graph.from_device_edges(s, d, num_nodes=n, weights=w)

    for direction in ("forward", "reverse", "both"):
        ch, cd = gh.csr(direction), gd.csr(direction)
        assert ch.e_valid == cd.e_valid and ch.max_deg == cd.max_deg
        ev = ch.e_valid
        np.testing.assert_array_equal(
            np.asarray(ch.offsets), np.asarray(cd.offsets)
        )
        # lean device builds drop src (s() reconstructs from offsets)
        np.testing.assert_array_equal(
            np.asarray(ch.s()[:ev]), np.asarray(cd.s()[:ev])
        )
        np.testing.assert_array_equal(
            np.asarray(ch.dst[:ev]), np.asarray(cd.dst[:ev])
        )
        np.testing.assert_allclose(
            np.asarray(ch.w()[:ev]), np.asarray(cd.w()[:ev])
        )

    np.testing.assert_allclose(
        gh.pagerank(backend="device", as_array=True),
        gd.pagerank(backend="device", as_array=True),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        gh.connected_components(backend="device", as_array=True),
        gd.connected_components(backend="device", as_array=True),
    )
    dh, ph = gh.bfs(0, as_array=True, backend="device")
    dd_, pd = gd.bfs(0, as_array=True, backend="device")
    np.testing.assert_array_equal(dh, dd_)
    np.testing.assert_array_equal(ph, pd)


def test_device_graph_lazy_host_mirrors(rng):
    """Host mirrors materialize once on first host-side touch and the
    host backend then agrees; dict-mode results still work."""
    from muninn_tpu.graph import Graph

    n, e = 200, 1200
    s = rng.integers(0, n, e)
    d = rng.integers(0, n, e)
    gd = Graph.from_device_edges(s, d, num_nodes=n)
    assert gd.num_edges == e and gd.num_nodes == n
    assert gd._src_np is None  # nothing downloaded yet
    pr_dev = gd.pagerank(backend="device", as_array=True)
    assert gd._src_np is None  # device analytics keep it lazy
    np.testing.assert_array_equal(gd._src, s.astype(np.int32))
    np.testing.assert_allclose(
        gd.pagerank(backend="host", as_array=True), pr_dev,
        rtol=2e-4, atol=1e-7,
    )
    cc = gd.connected_components()
    assert isinstance(cc, dict) and len(cc) == n
    # identity table semantics: ids are indices; foreign ids rejected
    assert gd.node_index(5) == 5
    import pytest

    with pytest.raises(KeyError):
        gd.node_index("zebra")
    with pytest.raises(KeyError):
        gd.nodes.find_or_add(n + 7)


def test_device_graph_auto_routing_stays_on_device(rng):
    """'auto' must not route an unmaterialized device-resident graph to
    the host engine: the host path would first download the whole COO
    through the tunnel, inverting from_device_edges' nothing-crosses-
    the-host-boundary promise. Once mirrors exist, tiny graphs route
    host again."""
    from muninn_tpu.graph import Graph

    n, e = 150, 800
    gd = Graph.from_device_edges(
        rng.integers(0, n, e), rng.integers(0, n, e), num_nodes=n
    )
    assert gd._use_host("auto", 0.0) is False
    pr = gd.pagerank(as_array=True)  # default backend='auto'
    assert gd._src_np is None        # no mirror download happened
    assert abs(float(pr.sum()) - 1.0) < 1e-3
    _ = gd._src                      # materialize mirrors explicitly
    assert gd._use_host("auto", 0.0) is True


def test_centrality_on_edgeless_graph():
    """Edgeless graphs return zero centralities instead of crashing in
    dedupe_parallel_edges (empty-run broadcast)."""
    from muninn_tpu.graph import Graph

    g = Graph.from_edges([], [])
    assert g.betweenness() == {}
    g2 = Graph.from_edges([0], [0])  # one self-loop, nodes exist
    g2._src = np.zeros(0, np.int32)  # simulate filtered-empty COO
    g2._dst = np.zeros(0, np.int32)
    g2._w = np.zeros(0, np.float32)
    bc = g2.betweenness()
    assert all(v == 0.0 for v in bc.values())
    assert g2.edge_betweenness() == {}


def test_chunked_fixpoints_match_one_shot(rng):
    """edge_chunk > 0 (the 100M-edge peak-memory regime) must be
    result-identical to the one-shot kernels: BFS depths/parents,
    components labels (2-CSR form vs merged-'both' pull), pagerank."""
    import jax.numpy as jnp
    from muninn_tpu.graph import Graph
    from muninn_tpu.graph import traversal as trv
    from muninn_tpu.graph.pagerank import pagerank_sorted
    from muninn_tpu.ops.segments import n_passes_for

    n, e = 300, 2000
    s = rng.integers(0, n, e)
    d = rng.integers(0, n, e)
    g = Graph.from_edges(s, d)
    cr = g.csr("reverse")
    npr = n_passes_for(cr.max_deg)
    ec = 256
    assert ec < cr.capacity

    dep0, par0 = trv.bfs_pull(
        cr.offsets, cr.dst, jnp.int32(0), n, n, n_passes=npr)
    for ipd in (0, 2):  # 2: multiple bounded dispatches (worker limit)
        dep1, par1 = trv.bfs_pull(
            cr.offsets, cr.dst, jnp.int32(0), n, n, n_passes=npr,
            edge_chunk=ec, iters_per_dispatch=ipd)
        np.testing.assert_array_equal(np.asarray(dep0), np.asarray(dep1))
        np.testing.assert_array_equal(np.asarray(par0), np.asarray(par1))

    cf = g.csr("forward")
    cb = g.csr("both")
    comp_both = np.asarray(trv.connected_components_pull(
        cb.offsets, cb.dst, n, n_passes=n_passes_for(cb.max_deg)))
    for ec2, ipd in ((0, 0), (ec, 0), (ec, 1)):
        comp2 = np.asarray(trv.connected_components_2csr(
            cf.offsets, cf.dst, cr.offsets, cr.dst, n,
            n_passes_f=n_passes_for(cf.max_deg), n_passes_r=npr,
            edge_chunk=ec2, iters_per_dispatch=ipd))
        np.testing.assert_array_equal(comp_both, comp2)

    deg = np.asarray(cf.degrees(), np.float32)
    pr0 = np.asarray(pagerank_sorted(
        cr.offsets, cr.dst, cr.w(), jnp.asarray(deg), n))
    pr1 = np.asarray(pagerank_sorted(
        cr.offsets, cr.dst, jnp.zeros((1,), jnp.float32),
        jnp.asarray(deg), n, edge_chunk=ec))
    # chunked prefix sums accumulate in a different order: f32-noise
    # level differences only (measured max 7e-8 abs on rank ~3e-3)
    np.testing.assert_allclose(pr0, pr1, rtol=1e-4, atol=1e-7)
    # blocked dispatch (worker ~60 s single-execution limit) runs the
    # same per-iteration math across 7+7+6-iteration programs; only
    # cross-program fusion rounding may differ
    pr2 = np.asarray(pagerank_sorted(
        cr.offsets, cr.dst, jnp.zeros((1,), jnp.float32),
        jnp.asarray(deg), n, edge_chunk=ec, iters_per_dispatch=7))
    np.testing.assert_allclose(pr1, pr2, rtol=1e-6, atol=1e-9)


def test_lean_device_graph_unweighted(rng):
    """from_device_edges without weights builds lean CSRs (weights=None,
    src=None) and all analytics agree with the host-interned build."""
    from muninn_tpu.graph import Graph

    n, e = 250, 1500
    s = rng.integers(0, n, e)
    d = rng.integers(0, n, e)
    gh = Graph.from_edges(s, d)
    gd = Graph.from_device_edges(s, d, num_nodes=n)

    cd = gd.csr("forward")
    assert cd.weights is None and cd.src is None
    ch = gh.csr("forward")
    ev = ch.e_valid
    np.testing.assert_array_equal(np.asarray(ch.s()[:ev]),
                                  np.asarray(cd.s()[:ev]))
    np.testing.assert_allclose(np.asarray(ch.w()[:ev]),
                               np.asarray(cd.w()[:ev]))

    np.testing.assert_allclose(
        gh.pagerank(backend="device", as_array=True),
        gd.pagerank(backend="device", as_array=True), rtol=1e-5)
    dh, ph = gh.bfs(0, backend="device", as_array=True)
    dd, pd = gd.bfs(0, backend="device", as_array=True)
    np.testing.assert_array_equal(dh, dd)
    np.testing.assert_array_equal(ph, pd)
    np.testing.assert_array_equal(
        gh.connected_components(backend="device", as_array=True),
        gd.connected_components(backend="device", as_array=True))


def test_coo_drop_derives_opposite_direction(rng, monkeypatch):
    """Lean regime: once one CSR direction is built the padded COO is
    dropped and the opposite direction (and 'both', and the host
    mirror download) derive from the built CSR — same edge multiset,
    identical analytics, weighted and unweighted."""
    from muninn_tpu.graph import Graph, core

    monkeypatch.setattr(core, "LEAN_COO_DROP_ABOVE", 64)
    n, e = 200, 1200
    s = rng.integers(0, n, e)
    d = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32) + 0.1

    for weights in (None, w):
        gh = Graph.from_edges(s, d, weights)
        gd = Graph.from_device_edges(s, d, weights=weights, num_nodes=n)

        # build one direction -> COO drops; other direction derives
        first = gd.csr("reverse")
        assert gd._dev_coo is None and gd.device_native
        derived = gd.csr("forward")
        both = gd.csr("both")

        for ch, cd in ((gh.csr("reverse"), first),
                       (gh.csr("forward"), derived),
                       (gh.csr("both"), both)):
            ev = ch.e_valid
            assert cd.e_valid == ev
            np.testing.assert_array_equal(np.asarray(ch.offsets),
                                          np.asarray(cd.offsets))
            # derived within-row order differs from input order:
            # compare rows as multisets of (dst, w) pairs
            hs = np.lexsort((np.asarray(ch.w()[:ev]),
                             np.asarray(ch.dst[:ev]),
                             np.asarray(ch.s()[:ev])))
            ds = np.lexsort((np.asarray(cd.w()[:ev]),
                             np.asarray(cd.dst[:ev]),
                             np.asarray(cd.s()[:ev])))
            np.testing.assert_array_equal(
                np.asarray(ch.dst[:ev])[hs], np.asarray(cd.dst[:ev])[ds])
            np.testing.assert_allclose(
                np.asarray(ch.w()[:ev])[hs], np.asarray(cd.w()[:ev])[ds])

        # derived rows sum edges in a different order: f32 noise only
        np.testing.assert_allclose(
            gh.pagerank(backend="device", as_array=True,
                        weighted=weights is not None),
            gd.pagerank(backend="device", as_array=True,
                        weighted=weights is not None),
            rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(
            gh.connected_components(backend="device", as_array=True),
            gd.connected_components(backend="device", as_array=True))
        dh, _ = gh.bfs(0, backend="device", as_array=True)
        dd, _ = gd.bfs(0, backend="device", as_array=True)
        np.testing.assert_array_equal(dh, dd)

        # host mirror downloads from the CSR after the drop
        sd, dd2, wd = gd.host_coo()
        hs2 = np.lexsort((wd, dd2, sd))
        sh, dh2, wh = gh.host_coo()
        hh = np.lexsort((wh, dh2, sh))
        np.testing.assert_array_equal(sd[hs2], sh[hh])
        np.testing.assert_array_equal(dd2[hs2], dh2[hh])
        np.testing.assert_allclose(wd[hs2], wh[hh])
