"""dbt-style lineage queries with the selector DSL (reference: docs/graph-select.md)."""
from muninn_tpu import Graph, select

deps = [("A","B"), ("Y","E"), ("B","C"), ("C","D"), ("C","E"), ("E","F")]
g = Graph.from_edges(*zip(*deps))

print("what must rebuild if C changes:", [n for n, _, _ in select(g, "@C")])
print("C's ancestors:", [n for n, _, _ in select(g, "+C")])
print("common upstream of D and E:", [n for n, _, _ in select(g, "+D,+E")])
print("unrelated to C:", [n for n, _, _ in select(g, "not +C+")])
