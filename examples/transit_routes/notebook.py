"""Tutorial notebook source for transit_routes.ipynb."""

# %% [markdown]
# ## 1. A metro map with travel times and opening years

# %%
from muninn_tpu import Graph

SEGMENTS = [
    ("airport", "central", 18.0, 1990),
    ("central", "museum", 4.0, 1990),
    ("museum", "harbor", 5.0, 1990),
    ("central", "university", 6.0, 2002),
    ("university", "harbor", 7.0, 2002),
    ("airport", "harbor", 35.0, 1990),      # slow direct shuttle
    ("central", "stadium", 9.0, 2020),      # new line
    ("stadium", "harbor", 3.0, 2020),
]
src, dst, minutes, opened = zip(*SEGMENTS)
len(SEGMENTS)

# %% [markdown]
# ## 2. Build the (undirected) network
#
# Metro service runs both ways: load each segment in both directions.

# %%
g = Graph.from_edges(src + dst, dst + src, minutes + minutes)
g.num_nodes, g.num_edges

# %% [markdown]
# ## 3. Fewest stops vs fastest route
#
# Unweighted shortest path counts hops; `weighted=True` sums minutes.

# %%
stops_path, n_hops = g.shortest_path("airport", "harbor", weighted=False)
print(f"fewest stops : {' -> '.join(stops_path)} ({int(n_hops)} hops)")

# %%
fast_path, total_min = g.shortest_path("airport", "harbor", weighted=True)
print(f"fastest      : {' -> '.join(fast_path)} ({total_min:.0f} min)")

# %% [markdown]
# ## 4. Reachability

# %%
reach = sorted(n for n, d, _ in g.bfs("airport", max_depth=2))
reach

# %% [markdown]
# ## 5. The most central station
#
# Weighted closeness: which station is nearest (in minutes) to all
# others?

# %%
cl = g.closeness(normalized=True, weighted=True)
hub = max(cl, key=cl.get)
hub

# %% [markdown]
# ## 6. Temporal filter: the 2015 network
#
# `timestamps` + `time_end` drop edges that didn't exist yet — the
# stadium line (2020) disappears and the old route returns.

# %%
g2015 = Graph.from_edges(
    src + dst, dst + src, minutes + minutes,
    timestamps=opened + opened, time_end=2015,
)
old_path, old_min = g2015.shortest_path("airport", "harbor", weighted=True)
print(f"fastest in 2015: {' -> '.join(old_path)} ({old_min:.0f} min)")

# %% [markdown]
# ## 7. Compare the eras

# %%
assert total_min <= old_min
{"today": (fast_path, total_min), "in_2015": (old_path, old_min)}

# %% [markdown]
# ## 8. Summary

# %%
{"fast_path": fast_path, "total_min": total_min, "hub": hub}
