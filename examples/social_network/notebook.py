"""Tutorial notebook source for social_network.ipynb."""

# %% [markdown]
# ## 1. A follow graph with hidden structure
#
# Two complete friend circles bridged by one edge (dana → gil). The
# analytics should *discover* this from the edges alone.

# %%
from muninn_tpu import Graph

CIRCLE_A = ["alice", "bob", "carol", "dana"]
CIRCLE_B = ["gil", "hana", "ivan", "june"]
FOLLOWS = (
    [(a, b) for a in CIRCLE_A for b in CIRCLE_A if a < b]
    + [(a, b) for a in CIRCLE_B for b in CIRCLE_B if a < b]
    + [("dana", "gil")]
)
g = Graph.from_edges(*zip(*FOLLOWS))
g.num_nodes, g.num_edges

# %% [markdown]
# ## 2. PageRank — who matters?

# %%
pr = g.pagerank()
sorted_pr = sorted(pr.items(), key=lambda kv: -kv[1])[:3]
sorted_pr

# %% [markdown]
# ## 3. Degrees and connectivity

# %%
deg = g.degree(direction="both")
print({n: int(d) for n, d in sorted(deg.items())})
comps = g.connected_components()
print("one component of size:", comps["alice"][1])

# %% [markdown]
# ## 4. Leiden — recover the circles

# %%
labels, q = g.leiden(seed=0)
groups: dict = {}
for n, c in labels.items():
    groups.setdefault(c, []).append(n)
communities = sorted(sorted(m) for m in groups.values())
split_ok = communities == [sorted(CIRCLE_A), sorted(CIRCLE_B)]
print(f"leiden (Q={q:.3f}):", communities)
print("recovered the two circles:", split_ok)

# %% [markdown]
# ## 5. Betweenness — find the brokers
#
# The two bridge endpoints carry every inter-circle shortest path.

# %%
bt = g.betweenness(normalized=True)
bridge_nodes = sorted(bt, key=bt.get, reverse=True)[:2]
[(n, round(bt[n], 3)) for n in bridge_nodes]

# %% [markdown]
# ## 6. Edge betweenness — find the bridge itself

# %%
eb = g.edge_betweenness(normalized=True)
bridge = max(eb, key=eb.get)
bridge

# %% [markdown]
# ## 7. Closeness of the bridge endpoints

# %%
cl = g.closeness(normalized=True)
{n: round(cl[n], 3) for n in ("dana", "gil")}

# %% [markdown]
# ## 8. Verify what we found

# %%
assert split_ok
assert set(bridge) <= {"dana", "gil"}
{"split_ok": split_ok, "bridge": bridge, "bridge_nodes": bridge_nodes}
