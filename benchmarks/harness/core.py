"""Treatment registry + record plumbing (reference ``treatments/base.py``
+ ``harness.py`` roles).

A Treatment owns a parameter ``grid`` (the permutations) and a
``run(params, rng, emit)`` callable that measures ONE permutation and
emits one or more records through ``emit(perm_dict, metrics, wall_s)``.
"""

from __future__ import annotations

import platform
import resource
import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np


def _jax_backend() -> str:
    """The RESOLVED jax backend, without ever initializing one.

    Rows must say which backend actually ran them (a tunnel outage
    silently resolves backend='cpu' and host timings would masquerade
    as device rows). But host-only treatments never touch jax, and
    *initializing* the backend just to stamp a record would hang on a
    dead tunnel — so peek at jax's already-built backend table and
    report "none" when nothing was initialized.
    """
    import sys

    mod = sys.modules.get("jax")
    if mod is None:
        return "none"
    try:
        from jax._src import xla_bridge  # private: backend init table

        if xla_bridge._backends:
            return str(mod.default_backend())
    except Exception:
        pass
    return "none"


@dataclass
class Record:
    treatment: str
    permutation: dict
    metrics: dict
    wall_s: float
    peak_rss_mb: float
    platform: str = field(
        default_factory=lambda: f"{platform.system()}-{platform.machine()}".lower()
    )
    backend: str = field(default_factory=_jax_backend)
    ts: float = field(default_factory=time.time)


@dataclass
class Treatment:
    """One benchmark family: a permutation grid + a single-permutation
    runner (the reference's Treatment ABC, collapsed to data + fns)."""

    name: str
    grid: Callable[[list[int]], list[dict]]
    run: Callable[[dict, np.random.Generator, Callable], None]


REGISTRY: dict[str, Treatment] = {}


def treatment(name: str, grid):
    def deco(fn):
        REGISTRY[name] = Treatment(name, grid, fn)
        return fn

    return deco


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def emit_for(treatment_name: str, out, collect: list | None = None):
    """Build the ``emit(perm, metrics, wall_s)`` callback: prints the
    JSONL line, appends to the open ``out`` file (if any), and collects
    Record objects for per-permutation artifacts."""
    import json

    def emit(perm: dict, metrics: dict, wall_s: float):
        rec = Record(treatment_name, perm, metrics, wall_s, _rss_mb())
        line = json.dumps(rec.__dict__)
        print(line)
        if out:
            out.write(line + "\n")
            out.flush()
        if collect is not None:
            collect.append(rec)

    return emit


# ───────────────────── shared data generators ─────────────────────


def _clustered(rng, n, dim):
    """Clustered unit vectors: the corpus model for vss treatments."""
    c = rng.standard_normal((max(n // 100, 4), dim)).astype(np.float32)
    x = c[rng.integers(0, len(c), n)] + 0.3 * rng.standard_normal(
        (n, dim)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def _heldout_queries(rng, x, n_q):
    """Held-out same-distribution queries: perturbed corpus points —
    the reference's methodology (AG News queries are documents drawn
    from the same corpus distribution,
    ``benchmarks/harness/treatments/vss.py`` role). Round-2 drew
    queries from FRESH random cluster centers, i.e. out-of-distribution
    — that artifact, not the engine, produced the 0.72-0.91 small-N
    recall (in-distribution recall measures 0.99+)."""
    base = x[rng.integers(0, len(x), n_q)]
    q = base + 0.05 * rng.standard_normal((n_q, x.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q


def _er_graph(rng, n, avg_deg):
    e = n * avg_deg
    return rng.integers(0, n, e), rng.integers(0, n, e)


def _er_names(n_base: int) -> list[str]:
    """Synthetic company-name dataset for kg_resolve: n_base distinct
    names, each with 2 systematic variants (UPPERCASE; 'Hldgs'
    abbreviation).

    Name entropy SCALES with n_base (above the legacy 2000 tier, which
    stays bit-stable for the committed small-size rows): with fixed
    3+2-syllable names from a 16-syllable alphabet, birthday collisions
    make distinct bases near-identical at ~10k+ (one-syllable-apart
    names are unresolvable from names alone, so gold-cluster F1 is
    information-theoretically capped no matter the resolver). Syllable
    counts are chosen so the expected number of one-syllable-apart base
    pairs stays <= 0.5% of n_base and the second-word crowding (bases
    per shared second word) stays <= ~25 — keeping gold RECOVERABLE
    while the task (case folding, abbreviation, shared rare tokens)
    stays the hard part."""
    syll = ["zor", "mak", "tel", "vin", "qua", "rex", "bol", "nim",
            "gar", "plu", "sev", "tro", "wik", "yam", "dex", "cor"]
    if n_base <= 2000:
        s1, s2, alpha = 3, 2, syll
    else:
        onsets = ["z", "m", "t", "v", "q", "r", "b", "n",
                  "g", "p", "s", "d", "w", "y", "k", "f"]
        vowels = ["a", "e", "i", "o"]
        alpha = [o + v + c for o in onsets for v in vowels
                 for c in ("r", "x")][:64]
        a = len(alpha)
        s1 = 3
        while (n_base * n_base / 2) * s1 * (a - 1) / a**s1 > 0.005 * n_base:
            s1 += 1
        s2 = 2
        while n_base / a**s2 > 25:
            s2 += 1

    def mk(i):
        r = np.random.default_rng(i)
        return (
            "".join(r.choice(alpha, s1)).capitalize()
            + " "
            + "".join(r.choice(alpha, s2)).capitalize()
        )

    base = [f"{mk(i)} Holdings" for i in range(n_base)]
    return (
        base
        + [b.upper() for b in base]
        + [b.replace(" Holdings", " Hldgs") for b in base]
    )
