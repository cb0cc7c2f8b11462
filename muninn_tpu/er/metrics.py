"""Entity-resolution quality metrics: B-Cubed F1 and pairwise F1.

The reference scores its ER pipeline with these two metrics
(``/root/reference/examples/er_v3/metrics.py``). Formulation here is
the closed-form contingency-table version (vectorized numpy) instead of
per-element set intersections:

- B-Cubed precision = (1/n) * sum_{p,g} c_{pg}^2 / |P_p|, recall with
  |G_g| — where c_{pg} is the contingency count of predicted cluster p
  vs gold cluster g (each element's "fraction of my predicted cluster
  that shares my gold cluster" aggregates per (p, g) cell).
- Pairwise: TP = sum C(c_{pg}, 2); precision over predicted same-cluster
  pairs, recall over gold same-cluster pairs.

Both take ``element -> cluster`` mappings; only elements present in
both are evaluated.
"""

from __future__ import annotations

import numpy as np


def _aligned_labels(predicted: dict, gold: dict) -> tuple[np.ndarray, np.ndarray]:
    common = sorted(set(predicted) & set(gold), key=repr)
    p = np.array([predicted[e] for e in common])
    g = np.array([gold[e] for e in common])
    _, p = np.unique(p, return_inverse=True)
    _, g = np.unique(g, return_inverse=True)
    return p, g


def _contingency(p: np.ndarray, g: np.ndarray):
    np_, ng = int(p.max()) + 1, int(g.max()) + 1
    key = p.astype(np.int64) * ng + g
    uk, counts = np.unique(key, return_counts=True)
    cell_p = (uk // ng).astype(np.int64)
    cell_g = (uk % ng).astype(np.int64)
    size_p = np.bincount(p, minlength=np_)
    size_g = np.bincount(g, minlength=ng)
    return counts.astype(np.float64), cell_p, cell_g, size_p, size_g


def bcubed_f1(predicted: dict, gold: dict) -> dict:
    """B-Cubed precision/recall/F1 (primary ER metric)."""
    p, g = _aligned_labels(predicted, gold)
    n = len(p)
    if n == 0:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    c, cp, cg, sp, sg = _contingency(p, g)
    prec = float(np.sum(c * c / sp[cp]) / n)
    rec = float(np.sum(c * c / sg[cg]) / n)
    f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    return {"precision": round(prec, 4), "recall": round(rec, 4), "f1": round(f1, 4)}


def pairwise_f1(predicted: dict, gold: dict) -> dict:
    """Pairwise precision/recall/F1 (secondary ER metric)."""
    p, g = _aligned_labels(predicted, gold)
    if len(p) < 2:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    c, _, _, sp, sg = _contingency(p, g)

    def c2(x):
        return float(np.sum(x * (x - 1) / 2.0))

    tp = c2(c)
    pred_pairs = c2(sp.astype(np.float64))
    gold_pairs = c2(sg.astype(np.float64))
    prec = tp / pred_pairs if pred_pairs > 0 else 0.0
    rec = tp / gold_pairs if gold_pairs > 0 else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    return {"precision": round(prec, 4), "recall": round(rec, 4), "f1": round(f1, 4)}
