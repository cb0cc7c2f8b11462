"""Graph analytics on a small social network (reference: examples/social_network)."""
from muninn_tpu import Graph

follows = [
    ("alice", "bob"), ("bob", "carol"), ("carol", "alice"),
    ("dave", "alice"), ("dave", "bob"), ("erin", "dave"),
    ("frank", "erin"), ("erin", "frank"),
]
g = Graph.from_edges(*zip(*follows))

print("pagerank:", {k: round(v, 3) for k, v in g.pagerank().items()})
print("components:", g.connected_components())
print("betweenness:", {k: round(v, 3) for k, v in g.betweenness(normalized=True).items()})
labels, q = g.leiden(seed=0)
print("communities:", labels, "modularity:", round(q, 3))
