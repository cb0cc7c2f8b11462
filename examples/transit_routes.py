"""Weighted shortest paths (reference: examples/transit_routes)."""
from muninn_tpu import Graph

edges = [
    ("A", "B", 4.0), ("B", "C", 3.0), ("A", "D", 1.0),
    ("D", "E", 2.0), ("E", "C", 2.0), ("B", "E", 5.0),
]
src, dst, w = zip(*edges)
g = Graph.from_edges(src, dst, w)
path, dist = g.shortest_path("A", "C", weighted=True)
print("fastest route:", " -> ".join(path), f"({dist} min)")
print("unweighted hops:", g.shortest_path("A", "C", weighted=False))
