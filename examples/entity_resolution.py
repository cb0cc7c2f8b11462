"""Full ER pipeline: embed names -> KNN blocking -> JW/cosine cascade ->
Leiden (reference: examples/er_v3)."""
import numpy as np
from muninn_tpu.models.embed import load_embed_model, embed
from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.er import Entity, resolve_entities

names = [
    "Acme Corporation", "ACME Corporation", "Acme Corp",
    "Globex Incorporated", "Globex Inc",
    "Wayne Enterprises", "Stark Industries",
]
ents = [Entity(id=str(i), name=n, source=f"crm{i % 2}") for i, n in enumerate(names)]

load_embed_model("er-demo", dim=64)
idx = FlatIndex(64, "cosine")
idx.insert(np.arange(len(names)), embed("er-demo", names))

out = resolve_entities(ents, idx, k=4, dist_threshold=0.45, jw_weight=0.7)
by_cluster = {}
for eid, c in out["clusters"].items():
    by_cluster.setdefault(c, []).append(names[int(eid)])
for c, members in sorted(by_cluster.items()):
    print(f"cluster {c}: {members}")
