"""Permutation registry (reference ``registry.py``:
``all_permutations`` / ``filter_permutations`` / ``permutation_status``).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

import benchmarks.harness.treatments  # noqa: F401 — populates REGISTRY
from benchmarks.harness.core import REGISTRY, emit_for

RESULTS_DIR = Path(__file__).resolve().parent.parent / "results"

DEFAULT_SIZES = [1000, 5000]


@dataclass(frozen=True)
class Permutation:
    treatment: str
    params_json: str  # canonical JSON (sorted keys) — hashable

    @property
    def params(self) -> dict:
        return json.loads(self.params_json)

    @property
    def perm_id(self) -> str:
        parts = [self.treatment] + [
            f"n{v}" if k == "n" else f"{k}-{v}"
            for k, v in sorted(self.params.items())
        ]
        return "_".join(parts)

    @property
    def label(self) -> str:
        return f"{self.treatment}: " + ", ".join(
            f"{k}={v}" for k, v in sorted(self.params.items())
        )


def _perm(treatment: str, params: dict) -> Permutation:
    return Permutation(treatment, json.dumps(params, sort_keys=True))


def all_permutations(sizes: list[int] | None = None) -> list[Permutation]:
    sizes = sizes or DEFAULT_SIZES
    out = []
    for name, t in REGISTRY.items():
        for params in t.grid(sizes):
            out.append(_perm(name, params))
    return out


def filter_permutations(
    sizes: list[int] | None = None,
    treatment: str | None = None,
    perm_id: str | None = None,
) -> list[Permutation]:
    perms = all_permutations(sizes)
    if treatment:
        perms = [p for p in perms if p.treatment == treatment]
    if perm_id:
        perms = [p for p in perms if p.perm_id == perm_id]
    return perms


def artifact_dir(perm: Permutation, results_dir: Path | None = None) -> Path:
    return (results_dir or RESULTS_DIR) / perm.perm_id


def permutation_status(
    sizes: list[int] | None = None, results_dir: Path | None = None
) -> list[tuple[Permutation, bool]]:
    """(permutation, done) — done when the per-permutation artifact
    exists (the reference checks ``results/<id>/db.sqlite``)."""
    return [
        (p, (artifact_dir(p, results_dir) / "record.json").exists())
        for p in all_permutations(sizes)
    ]


def run_permutation(
    perm: Permutation,
    rng: np.random.Generator,
    out=None,
    results_dir: Path | None = None,
) -> list:
    """Execute one permutation: run the treatment, stream JSONL records,
    and write the per-permutation artifact
    (``results/<id>/record.json``)."""
    collected: list = []
    emit = emit_for(perm.treatment, out, collected)
    t0 = time.time()
    REGISTRY[perm.treatment].run(perm.params, rng, emit)
    wall = time.time() - t0
    d = artifact_dir(perm, results_dir)
    d.mkdir(parents=True, exist_ok=True)
    (d / "record.json").write_text(json.dumps(
        {
            "permutation_id": perm.perm_id,
            "treatment": perm.treatment,
            "params": perm.params,
            "wall_s": wall,
            "records": [r.__dict__ for r in collected],
        },
        indent=1,
    ))
    return collected
