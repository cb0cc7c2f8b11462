"""Edge cases across the public API: tiny/degenerate inputs that real
users hit first."""

import numpy as np
import pytest

from muninn_tpu import Graph, GraphCache, HnswIndex, FlatIndex, select
from muninn_tpu.graph.selector import SelectorError


def test_graph_single_edge_everything():
    g = Graph.from_edges(["a"], ["b"])
    assert g.pagerank()
    assert g.connected_components()["a"][1] == 2
    assert g.degree() == {"a": 1.0, "b": 1.0}
    assert g.betweenness() == {"a": 0.0, "b": 0.0}
    assert g.closeness()["b"] > 0
    labels, q = g.leiden()
    assert len(labels) == 2
    path, d = g.shortest_path("a", "b")
    assert path == ["a", "b"] and d == 1.0


def test_graph_self_loop():
    g = Graph.from_edges(["a", "a"], ["a", "b"])
    pr = g.pagerank()
    assert abs(sum(pr.values()) - 1.0) < 1e-4
    labels, _ = g.leiden()
    assert set(labels) == {"a", "b"}
    rows = g.bfs("a")
    assert {n for n, _, _ in rows} == {"a", "b"}


def test_graph_all_dangling_pagerank():
    # star pointing inward: center has no out-edges
    g = Graph.from_edges(["a", "b", "c"], ["z", "z", "z"])
    pr = g.pagerank()
    assert abs(sum(pr.values()) - 1.0) < 1e-4
    assert pr["z"] > pr["a"]


def test_shortest_path_to_self():
    g = Graph.from_edges(["a"], ["b"])
    path, d = g.shortest_path("a", "a")
    assert path == ["a"] and d == 0.0


def test_shortest_path_unreachable():
    g = Graph.from_edges(["a", "c"], ["b", "d"])
    path, d = g.shortest_path("a", "d")
    assert path == [] and np.isinf(d)


def test_selector_on_cycle_terminates():
    g = Graph.from_edges(["a", "b", "c"], ["b", "c", "a"])
    assert {n for n, _, _ in select(g, "+a+")} == {"a", "b", "c"}
    assert {n for n, _, _ in select(g, "@a")} == {"a", "b", "c"}
    with pytest.raises(SelectorError):
        select(g, "a +")  # dangling '+' atom


def test_graph_cache_remove_nonexistent_edge():
    gc = GraphCache.from_edges(["a"], ["b"])
    gc.remove_edges(["x"], ["y"])  # unknown nodes: no-op
    assert gc.graph().num_edges == 1


def test_hnsw_delete_all_then_reinsert(rng):
    idx = HnswIndex(16, "l2", m=8, ef_construction=40, wave_size=50)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    idx.insert(np.arange(60), vecs)
    idx.delete(np.arange(60))
    assert len(idx) == 0
    ids, d = idx.search(vecs[0], k=3)
    assert (np.asarray(ids) == -1).all()
    # fresh inserts into the emptied index still work
    idx.insert(np.arange(100, 130), vecs[:30])
    ids, _ = idx.search(vecs[5], k=1, ef_search=16)
    assert ids[0] == 105


def test_hnsw_k_exceeds_live_count(rng):
    idx = HnswIndex(8, "l2", m=4, ef_construction=20, wave_size=10)
    idx.insert([1, 2, 3], rng.standard_normal((3, 8)).astype(np.float32))
    ids, d = idx.search(np.zeros(8, np.float32), k=10, ef_search=16)
    live = ids[ids >= 0]
    assert set(live) <= {1, 2, 3} and len(set(live)) == len(live)
    assert np.isinf(d[len(live):]).all()


def test_flat_empty_search():
    idx = FlatIndex(8, "l2", use_pallas=False)
    ids, d = idx.search(np.zeros(8, np.float32), k=3)
    assert (ids == -1).all() and np.isinf(d).all()


def test_graph_numpy_int_ids_roundtrip(rng):
    src = np.array([10, 20, 30], np.int64)
    dst = np.array([20, 30, 10], np.int64)
    g = Graph.from_edges(src, dst)
    rows = g.bfs(20)
    assert {n for n, _, _ in rows} == {10, 20, 30}
    pr = g.pagerank()
    assert set(pr) == {10, 20, 30}
