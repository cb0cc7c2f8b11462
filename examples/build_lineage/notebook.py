"""Tutorial notebook source for build_lineage.ipynb."""

# %% [markdown]
# ## 1. A data-pipeline DAG
#
# Sources feed staging models, staging feeds marts, marts feed
# dashboards — the classic dbt shape the selector DSL was built for.

# %%
from muninn_tpu import Graph, select

DEPS = [
    ("raw_orders", "stg_orders"), ("raw_users", "stg_users"),
    ("raw_events", "stg_events"),
    ("stg_orders", "fct_sales"), ("stg_users", "fct_sales"),
    ("stg_users", "dim_users"), ("stg_events", "fct_engagement"),
    ("fct_sales", "dash_revenue"), ("dim_users", "dash_revenue"),
    ("fct_engagement", "dash_growth"), ("dim_users", "dash_growth"),
]
g = Graph.from_edges(*zip(*DEPS))
g.num_nodes, g.num_edges

# %% [markdown]
# ## 2. Helper

# %%
def names(rows):
    return sorted(n for n, _, _ in rows)

# %% [markdown]
# ## 3. "stg_users changed — what must rebuild?"
#
# `X+` selects X and all its descendants.

# %%
rebuild = names(select(g, "stg_users+"))
rebuild

# %% [markdown]
# ## 4. "What does deploying dash_revenue require?"
#
# `+X` selects X and all its ancestors.

# %%
deploy = names(select(g, "+dash_revenue"))
deploy

# %% [markdown]
# ## 5. Depth bounds
#
# `1+X` keeps only direct parents.

# %%
near = names(select(g, "1+dash_revenue"))
near

# %% [markdown]
# ## 6. Set algebra
#
# Intersection with `,` — the shared upstream of both dashboards —
# and complement with `not`.

# %%
shared = names(select(g, "+dash_revenue,+dash_growth"))
print("shared upstream:", shared)
unaffected = names(select(g, "not stg_users+"))
print("unaffected by stg_users:", unaffected)

# %% [markdown]
# ## 7. Closure
#
# `@X` = X's descendants plus ALL their ancestors: the full build
# context needed to run X's subtree.

# %%
closure = list(select(g, "@fct_sales"))
for node, depth, direction in sorted(closure, key=lambda r: (r[1], r[0])):
    print(f"{node:16} depth={depth} {direction}")
assert "dash_revenue" in {n for n, _, _ in closure}

# %% [markdown]
# ## 8. Summary

# %%
{"rebuild": rebuild, "deploy": deploy, "closure_size": len(closure)}
