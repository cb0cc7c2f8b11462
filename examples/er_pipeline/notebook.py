"""Tutorial notebook source for er_pipeline.ipynb."""

# %% [markdown]
# ## 1. A labeled dirty dataset
#
# Noisy organization-name variants with known gold clusters — so the
# resolution can be SCORED, not just eyeballed.

# %%
import numpy as np

from muninn_tpu.er import Entity, bcubed_f1, pairwise_f1, resolve_entities
from muninn_tpu.index.flat import FlatIndex

from examples.er_pipeline.datasets import embed_names, make_org_dataset

records, gold = make_org_dataset(16, 4, seed=0)
len(records), len(set(gold.values()))

# %% [markdown]
# ## 2. Peek at the variants

# %%
[r["name"] for r in records[:6]]

# %% [markdown]
# ## 3. Embed names, load the blocking index

# %%
embs = embed_names(records, dim=64, seed=0)
idx = FlatIndex(64, "cosine")
idx.insert(np.arange(len(records)), embs)
len(idx)

# %% [markdown]
# ## 4. Run the cascade
#
# KNN blocking → exact / case-insensitive / JW+cosine scoring →
# Leiden clustering.

# %%
ents = [Entity(**r) for r in records]
out = resolve_entities(ents, idx, k=6, dist_threshold=0.2, jw_weight=0.8)
pred = out["clusters"]
len(set(pred.values()))

# %% [markdown]
# ## 5. Inspect the clusters

# %%
by_cluster: dict = {}
for rid, c in pred.items():
    by_cluster.setdefault(c, []).append(records[int(rid)]["name"])
for c, members in sorted(by_cluster.items())[:6]:
    print(f"cluster {c}: {members}")

# %% [markdown]
# ## 6. Score against gold
#
# B-Cubed and pairwise F1 — the reference's `er_v3` metrics.

# %%
bc = bcubed_f1(pred, gold)
pw = pairwise_f1(pred, gold)
print(f"B-Cubed  P={bc['precision']:.3f} R={bc['recall']:.3f} "
      f"F1={bc['f1']:.3f}")
print(f"Pairwise P={pw['precision']:.3f} R={pw['recall']:.3f} "
      f"F1={pw['f1']:.3f}")

# %% [markdown]
# ## 7. Quality gate

# %%
assert bc["f1"] >= 0.85
True

# %% [markdown]
# ## 8. Summary

# %%
{"bcubed_f1": round(bc["f1"], 3), "pairwise_f1": round(pw["f1"], 3),
 "n_clusters": len(by_cluster)}
