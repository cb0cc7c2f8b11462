"""Synthetic labeled ER dataset: gold entities with noisy name variants.

Plays the role of the reference's er_v3 dataset loaders
(``examples/er_v3/datasets.py``) without network access: organizations
get suffix/case/abbreviation/typo variants, and every record carries a
gold cluster id so the pipeline can be scored with B-Cubed / pairwise
F1.
"""

from __future__ import annotations

import numpy as np

_BASES = [
    "Acme", "Globex", "Initech", "Umbrella", "Wayne", "Stark", "Hooli",
    "Wonka", "Tyrell", "Cyberdyne", "Aperture", "Vandelay", "Sirius",
    "Massive Dynamic", "Oscorp", "Gringotts",
]
_SUFFIXES = ["Corporation", "Corp", "Inc", "Incorporated", "Ltd", "LLC",
             "Group", "Holdings", ""]


def _typo(name: str, rng: np.random.Generator) -> str:
    if len(name) < 4:
        return name
    i = int(rng.integers(1, len(name) - 1))
    return name[:i] + name[i + 1 :]  # drop one char


def make_org_dataset(
    n_entities: int = 16, variants_per_entity: int = 4, seed: int = 0,
) -> tuple[list[dict], dict]:
    """Returns (records, gold): records are Entity-shaped dicts with a
    unique ``id`` and a noisy ``name``; gold maps id -> gold cluster."""
    rng = np.random.default_rng(seed)
    records: list[dict] = []
    gold: dict[str, int] = {}
    rid = 0
    for k in range(min(n_entities, len(_BASES))):
        base = _BASES[k]
        seen = set()
        for v in range(variants_per_entity):
            suffix = _SUFFIXES[int(rng.integers(0, len(_SUFFIXES)))]
            name = f"{base} {suffix}".strip()
            style = int(rng.integers(0, 4))
            if style == 1:
                name = name.upper()
            elif style == 2:
                name = name.lower()
            elif style == 3 and v > 0:
                name = _typo(name, rng)
            if name in seen:
                name = f"{base} {_SUFFIXES[v % len(_SUFFIXES)]}".strip()
            seen.add(name)
            records.append(
                {"id": str(rid), "name": name, "source": f"feed{v % 3}"}
            )
            gold[str(rid)] = k
            rid += 1
    return records, gold


def embed_names(records: list[dict], dim: int = 64, seed: int = 0) -> np.ndarray:
    """Deterministic name embeddings: gold-blind, IDF-weighted hashed
    tokens + character trigrams (the role of a sentence-embedding
    model, kept local and reproducible). IDF makes the rare base name
    dominate over boilerplate suffixes (Corp/LLC/Holdings), the way a
    trained sentence encoder keys on the salient token."""
    import hashlib
    from collections import Counter

    def h(piece: bytes) -> tuple[int, float]:
        v = int.from_bytes(
            hashlib.blake2s(piece, digest_size=4).digest(), "little"
        )
        return v % dim, (1.0 if (v >> 16) % 2 else -1.0)

    docs = [r["name"].lower().split() for r in records]
    df = Counter(t for toks in docs for t in set(toks))
    n_docs = max(len(records), 1)
    out = np.zeros((len(records), dim), np.float32)
    for i, toks in enumerate(docs):
        for t in toks:
            idf = float(np.log(1.0 + n_docs / df[t]))
            j, s = h(t.encode())
            out[i, j] += 2.0 * idf * s
            padded = f" {t} "
            for k in range(len(padded) - 2):
                j, s = h(padded[k : k + 3].encode())
                out[i, j] += idf * s
    out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)
    return out
