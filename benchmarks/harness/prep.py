"""Data-cache preparation (the reference's ``prep`` stage: models are
downloaded and datasets embedded once into ``.npy`` caches,
``benchmarks/harness/README.md:62-72``; here the synthetic corpora and
name datasets are materialized once under ``benchmarks/data/``)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from benchmarks.harness.core import _clustered, _er_names, _heldout_queries

DATA_DIR = Path(__file__).resolve().parent.parent / "data"


def vss_cache_path(n: int, dim: int) -> Path:
    return DATA_DIR / f"vss_n{n}_d{dim}.npz"


def _zipf_clustered(rng, n, dim):
    """Zipf-skewed cluster sizes: a few giant clusters + a long tail —
    the HARD distribution for cluster-routing ANN (uniform probes
    under-cover giant clusters). The second synthetic dataset, playing
    the reference's ag_news-vs-wealth_of_nations dataset comparison
    role with a controlled distribution shift."""
    ncl = max(n // 100, 4)
    c = rng.standard_normal((ncl, dim)).astype(np.float32)
    p = 1.0 / np.arange(1, ncl + 1) ** 1.2
    p /= p.sum()
    assign = rng.choice(ncl, size=n, p=p)
    x = c[assign] + 0.3 * rng.standard_normal((n, dim)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def vss_data(rng, n: int, dim: int, n_q: int = 256,
             dataset: str = "clustered"):
    """(corpus, heldout queries, ood queries) — cached when prep ran
    (the cache covers the default 'clustered' dataset only)."""
    if dataset == "zipf":
        x = _zipf_clustered(rng, n, dim)
        return x, _heldout_queries(rng, x, n_q), _zipf_clustered(rng, n_q, dim)
    p = vss_cache_path(n, dim)
    if p.exists():
        z = np.load(p)
        if z["x"].shape == (n, dim) and len(z["q_heldout"]) >= n_q:
            return z["x"], z["q_heldout"][:n_q], z["q_ood"][:n_q]
    x = _clustered(rng, n, dim)
    q_heldout = _heldout_queries(rng, x, n_q)
    q_ood = _clustered(rng, n_q, dim)
    return x, q_heldout, q_ood


def er_cache_path(n_base: int) -> Path:
    # v2 = entropy-scaled names above the legacy 2000 tier (see
    # core._er_names); versioned path so stale caches can't serve the
    # old collision-prone names
    tag = "" if n_base <= 2000 else "_v2"
    return DATA_DIR / f"er_names{tag}_{n_base}.json"


def er_names(n_base: int) -> list[str]:
    p = er_cache_path(n_base)
    if p.exists():
        names = json.loads(p.read_text())
        if len(names) == 3 * n_base:
            return names
    return _er_names(n_base)


def prep(sizes: list[int], dim: int = 128, n_q: int = 256,
         seed: int = 0, kinds: list[str] | None = None) -> list[Path]:
    """Materialize caches for the given sizes. Returns written paths."""
    DATA_DIR.mkdir(parents=True, exist_ok=True)
    kinds = kinds or ["vectors", "er"]
    written = []
    if "vectors" in kinds:
        for n in sizes:
            p = vss_cache_path(n, dim)
            if p.exists():
                continue
            rng = np.random.default_rng(seed)
            x = _clustered(rng, n, dim)
            np.savez(
                p, x=x,
                q_heldout=_heldout_queries(rng, x, n_q),
                q_ood=_clustered(rng, n_q, dim),
            )
            written.append(p)
    if "er" in kinds:
        for n in sizes:
            n_base = max(n // 3, 4)
            p = er_cache_path(n_base)
            if p.exists():
                continue
            p.write_text(json.dumps(_er_names(n_base)))
            written.append(p)
    return written
