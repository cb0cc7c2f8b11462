"""Worked entity-resolution pipeline with quality scoring.

End-to-end analogue of the reference's ``examples/er_v3/pipeline.py``:

1. build a labeled dataset of noisy organization-name variants,
2. embed names and load a FlatIndex (KNN blocking),
3. run the full cascade (``resolve_entities``: guards, exact /
   case-insensitive / JW+cosine scoring, Leiden clustering, optional
   edge-betweenness bridge cutting),
4. score the predicted clustering against gold with B-Cubed F1 and
   pairwise F1.

Run: ``python -m examples.er_pipeline.pipeline``
"""

from __future__ import annotations

import numpy as np

from muninn_tpu.er import Entity, bcubed_f1, pairwise_f1, resolve_entities
from muninn_tpu.index.flat import FlatIndex

from examples.er_pipeline.datasets import embed_names, make_org_dataset


def run(
    *,
    n_entities: int = 16,
    variants: int = 4,
    k: int = 6,
    dist_threshold: float = 0.2,
    jw_weight: float = 0.8,
    eb_threshold: float | None = None,
    seed: int = 0,
    verbose: bool = True,
) -> dict:
    records, gold = make_org_dataset(n_entities, variants, seed=seed)
    embs = embed_names(records, dim=64, seed=seed)

    idx = FlatIndex(64, "cosine")
    idx.insert(np.arange(len(records)), embs)
    ents = [Entity(**r) for r in records]

    out = resolve_entities(
        ents, idx, k=k, dist_threshold=dist_threshold, jw_weight=jw_weight,
        eb_threshold=eb_threshold,
    )
    pred = out["clusters"]

    bc = bcubed_f1(pred, gold)
    pw = pairwise_f1(pred, gold)
    if verbose:
        by_cluster: dict = {}
        for rid, c in pred.items():
            by_cluster.setdefault(c, []).append(records[int(rid)]["name"])
        print(f"{len(records)} records -> {len(by_cluster)} clusters "
              f"(gold: {n_entities})")
        for c, members in sorted(by_cluster.items())[:8]:
            print(f"  cluster {c}: {members}")
        print(f"B-Cubed  P={bc['precision']:.3f} R={bc['recall']:.3f} "
              f"F1={bc['f1']:.3f}")
        print(f"Pairwise P={pw['precision']:.3f} R={pw['recall']:.3f} "
              f"F1={pw['f1']:.3f}")
    return {"bcubed": bc, "pairwise": pw, "clusters": pred, "gold": gold}


if __name__ == "__main__":
    run()
