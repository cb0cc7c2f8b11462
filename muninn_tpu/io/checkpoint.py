"""Checkpoint / resume — the shadow-table role.

The reference persists HNSW as ``_config/_nodes/_edges`` shadow tables
rewritten synchronously on every insert (``src/hnsw_vtab.c:138-341``,
the reason its insert throughput is ~150 vec/s) and reconstructs the
in-memory graph on connect (``:405-462``). Here persistence is
*decoupled from mutation*: ``save`` serializes the device arrays in one
shot (npz + JSON manifest), ``load`` restores them to HBM; incremental
durability between checkpoints is provided by the caller appending to a
``DeltaLog`` (the ``_delta`` table role, ``src/graph_adjacency.c:223-260``)
that is replayed on load.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp

FORMAT_VERSION = 1


def _write_manifest(path: Path, kind: str, meta: dict) -> None:
    manifest = {"format_version": FORMAT_VERSION, "kind": kind, **meta}
    # atomic swap: a crash mid-write must not tear the one file every
    # load gates on (a torn manifest bricks an otherwise-recoverable
    # checkpoint; part-written data files are caught by zip CRCs /
    # nodes_crc32 / block-length checks instead)
    tmp = path / "manifest.json.tmp"
    tmp.write_text(json.dumps(manifest, indent=2))
    os.replace(tmp, path / "manifest.json")


def _read_manifest(path: Path, kind: str) -> dict:
    m = json.loads((path / "manifest.json").read_text())
    if m.get("kind") != kind:
        raise ValueError(f"checkpoint at {path} is {m.get('kind')}, expected {kind}")
    if m.get("format_version") > FORMAT_VERSION:
        raise ValueError("checkpoint written by a newer format version")
    return m


# ───────────────────────── HNSW ─────────────────────────


def save_hnsw(index, path: str | os.PathLike) -> None:
    """Serialize an HnswIndex (vectors, validity, neighbor tables,
    levels, hi tables, id mapping, params) to a directory."""
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    index._flush_hi_wiring()  # materialize lazily-deferred upper levels
    store = index.store
    ids = np.full(store.capacity, -1, np.int64)
    for ext_id, slot in store._slot_of.items():
        ids[slot] = ext_id
    np.savez(
        p / "arrays.npz",
        vectors=np.asarray(store.vectors),
        valid=np.asarray(store.valid),
        ids=ids,
        levels=index.levels,
        neighbors0=np.asarray(index.neighbors0),
        dists0=np.asarray(index.dists0),
        hi_index=np.asarray(index.hi_index),
        hi_neighbors=np.asarray(index.hi_neighbors),
    )
    _write_manifest(
        p, "hnsw",
        {
            "dim": index.dim,
            "metric": index.metric.value,
            "m": index.m,
            "ef_construction": index.ef_construction,
            "entry_point": index.entry_point,
            "max_level": index.max_level,
            "hi_count": index._hi_count,
            "high_watermark": store.high_watermark,
            "count": len(store),
        },
    )


def load_hnsw(path: str | os.PathLike):
    """Restore an HnswIndex; searches after load return identical
    results to the index that was saved (xConnect-reload parity,
    ``src/hnsw_vtab.c:405-462``)."""
    from muninn_tpu.index.hnsw import HnswIndex

    p = Path(path)
    m = _read_manifest(p, "hnsw")
    z = np.load(p / "arrays.npz")
    idx = HnswIndex(
        m["dim"], m["metric"], m=m["m"], ef_construction=m["ef_construction"],
        capacity=z["vectors"].shape[0],
    )
    st = idx.store
    st.vectors = jnp.asarray(z["vectors"])
    st.valid = jnp.asarray(z["valid"])
    ids = z["ids"]
    st._id_of = ids.copy()
    st._slot_of = {int(i): int(s) for s, i in enumerate(ids) if i >= 0}
    st._count = m["count"]
    st._high = m["high_watermark"]
    idx.levels = z["levels"].copy()
    idx.neighbors0 = jnp.asarray(z["neighbors0"])
    idx.dists0 = jnp.asarray(z["dists0"])
    idx.hi_index = jnp.asarray(z["hi_index"])
    idx._hi_index_np = z["hi_index"].copy()
    idx.hi_neighbors = jnp.asarray(z["hi_neighbors"])
    idx._hi_count = m["hi_count"]
    idx.entry_point = m["entry_point"]
    idx.max_level = m["max_level"]
    return idx


# ───────────────────────── Flat ─────────────────────────


def save_flat(index, path: str | os.PathLike) -> None:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    store = index.store
    ids = np.full(store.capacity, -1, np.int64)
    for ext_id, slot in store._slot_of.items():
        ids[slot] = ext_id
    np.savez(
        p / "arrays.npz",
        vectors=np.asarray(store.vectors),
        valid=np.asarray(store.valid),
        ids=ids,
    )
    _write_manifest(
        p, "flat",
        {
            "dim": index.dim,
            "metric": index.metric.value,
            "high_watermark": store.high_watermark,
            "count": len(store),
            # search-mode config: shadows (int8/proj) are derived and
            # rebuild lazily on first search after load
            "precision": index.precision,
            "proj_dim": index.proj_dim,
            "rescore_r": index.rescore_r,
        },
    )


def load_flat(path: str | os.PathLike):
    from muninn_tpu.index.flat import FlatIndex

    p = Path(path)
    m = _read_manifest(p, "flat")
    z = np.load(p / "arrays.npz")
    idx = FlatIndex(
        m["dim"], m["metric"], capacity=z["vectors"].shape[0],
        precision=m.get("precision", "highest"),
        proj_dim=m.get("proj_dim", 128),
    )
    if "rescore_r" in m:
        idx.rescore_r = int(m["rescore_r"])
    st = idx.store
    st.vectors = jnp.asarray(z["vectors"])
    st.valid = jnp.asarray(z["valid"])
    ids = z["ids"]
    st._id_of = ids.copy()
    st._slot_of = {int(i): int(s) for s, i in enumerate(ids) if i >= 0}
    st._count = m["count"]
    st._high = m["high_watermark"]
    return idx


# ───────────────────────── IVF ─────────────────────────


def save_quantized(index, path: str | os.PathLike) -> None:
    """Persist a QuantizedFlatIndex: the int8 codes + per-row scales
    are the source of truth (the f32 originals are never stored —
    ``src/hnsw_vtab.c:149-180``'s shadow-table role at 1/4 the bytes)."""
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    store = index.store
    ids = np.full(store.capacity, -1, np.int64)
    for ext_id, slot in store._slot_of.items():
        ids[slot] = ext_id
    np.savez(
        p / "arrays.npz",
        codes=np.asarray(store.vectors),
        scales=np.asarray(store.scales),
        valid=np.asarray(store.valid),
        ids=ids,
    )
    _write_manifest(
        p, "quantized",
        {
            "dim": index.dim,
            "metric": index.metric.value,
            "high_watermark": store.high_watermark,
            "count": len(store),
        },
    )


def load_quantized(path: str | os.PathLike):
    from muninn_tpu.index.flat import QuantizedFlatIndex

    p = Path(path)
    m = _read_manifest(p, "quantized")
    z = np.load(p / "arrays.npz")
    idx = QuantizedFlatIndex(
        m["dim"], m["metric"], capacity=z["codes"].shape[0]
    )
    st = idx.store
    st.vectors = jnp.asarray(z["codes"], jnp.int8)
    st.scales = jnp.asarray(z["scales"], jnp.float32)
    st.valid = jnp.asarray(z["valid"])
    ids = z["ids"]
    st._id_of = ids.copy()
    st._slot_of = {int(i): int(s) for s, i in enumerate(ids) if i >= 0}
    st._count = m["count"]
    st._high = m["high_watermark"]
    return idx


def save_ivf(index, path: str | os.PathLike) -> None:
    """Serialize an IvfIndex (store + centroids + packed bf16 cluster
    blocks + membership + pending region) to a directory. Blocks are
    stored as a uint16 bit view (npz has no bfloat16)."""
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    store = index.store
    ids = np.full(store.capacity, -1, np.int64)
    for ext_id, slot in store._slot_of.items():
        ids[slot] = ext_id
    built = index.centroids is not None
    pending = (
        np.concatenate([np.asarray(s, np.int64) for s in index._pending])
        if index._pending else np.zeros(0, np.int64)
    )
    if store.vectors.dtype == jnp.bfloat16:
        # npz has no bfloat16: store the bit pattern (uint16 view),
        # restored via view on load (same trick as the bf16 blocks)
        arrays = {"vectors_u16": np.asarray(store.vectors).view(np.uint16)}
    else:
        arrays = {"vectors": np.asarray(store.vectors)}
    arrays.update({
        "valid": np.asarray(store.valid),
        "ids": ids,
        "pending": pending,
    })
    if built:
        arrays["centroids"] = np.asarray(index.centroids)
        if index.quant == "int8":
            arrays["blocks_i8"] = np.asarray(index.blocks)
            arrays["block_scales"] = np.asarray(index.block_scales)
        else:
            arrays["blocks_u16"] = np.asarray(index.blocks).view(np.uint16)
        arrays["member_slots"] = np.asarray(index.member_slots)
        arrays["fill"] = index._fill
    np.savez(p / "arrays.npz", **arrays)
    _write_manifest(
        p, "ivf",
        {
            "dim": index.dim,
            "metric": index.metric.value,
            "cluster_size": index.cluster_size,
            "nprobe": index.nprobe,
            "rescore_r": index.rescore_r,
            "slack": index.slack,
            "kmeans_iters": index.kmeans_iters,
            "assign_rounds": index.assign_rounds,
            "train_sample": index.train_sample,
            "seed": index.seed,
            "quant": index.quant,
            "built": built,
            "high_watermark": store.high_watermark,
            "count": len(store),
        },
    )


def load_ivf(path: str | os.PathLike):
    """Restore an IvfIndex; searches after load return identical
    results to the index that was saved."""
    from muninn_tpu.index.ivf import IvfIndex

    p = Path(path)
    m = _read_manifest(p, "ivf")
    z = np.load(p / "arrays.npz")
    bf16_store = "vectors_u16" in z
    vkey = "vectors_u16" if bf16_store else "vectors"
    idx = IvfIndex(
        m["dim"], m["metric"],
        cluster_size=m["cluster_size"], nprobe=m["nprobe"],
        rescore_r=m["rescore_r"], slack=m["slack"],
        kmeans_iters=m["kmeans_iters"],
        assign_rounds=m.get("assign_rounds", 2),
        train_sample=m["train_sample"], seed=m["seed"],
        capacity=z[vkey].shape[0],
        quant=m.get("quant", "bf16"),
        store_dtype=jnp.bfloat16 if bf16_store else jnp.float32,
    )
    st = idx.store
    st.vectors = (
        jnp.asarray(z["vectors_u16"]).view(jnp.bfloat16) if bf16_store
        else jnp.asarray(z["vectors"])
    )
    st.valid = jnp.asarray(z["valid"])
    ids = z["ids"]
    st._id_of = ids.copy()
    st._slot_of = {int(i): int(s) for s, i in enumerate(ids) if i >= 0}
    st._count = m["count"]
    st._high = m["high_watermark"]
    if m["built"]:
        idx.centroids = jnp.asarray(z["centroids"])
        if m.get("quant", "bf16") == "int8":
            idx.blocks = jnp.asarray(z["blocks_i8"])
            idx.block_scales = jnp.asarray(z["block_scales"])
        else:
            idx.blocks = jnp.asarray(
                z["blocks_u16"]
            ).view(jnp.bfloat16)
        idx.member_slots = jnp.asarray(z["member_slots"])
        idx._fill = z["fill"].copy()
    pending = z["pending"]
    idx._pending = [pending.copy()] if pending.size else []
    idx._pending_count = int(pending.size)
    return idx


# ───────────────────────── Delta log ─────────────────────────


class DeltaLog:
    """Append-only JSONL mutation log (the ``_delta`` shadow table
    role). Each record: {"op": "insert"|"delete", ...payload}.
    Replay bridges the gap between checkpoints."""

    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def append(self, op: str, **payload) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({"op": op, **payload}) + "\n")

    def append_many(self, records) -> None:
        """Bulk append: one file open + one write for a batch of record
        dicts (each must carry "op"). The per-record ``append`` costs an
        open/close per edge — minutes at 10M-edge bulk loads."""
        with open(self.path, "a") as f:
            f.write(
                "".join(json.dumps(r) + "\n" for r in records)
            )

    def __len__(self) -> int:
        if not self.path.exists():
            return 0
        with open(self.path) as f:
            return sum(1 for _ in f)

    def replay(self):
        """Yield records in append order. A malformed FINAL line is
        skipped — that's a torn write from a crash mid-append, and the
        record it held was never acknowledged. Malformed lines anywhere
        else are real corruption and raise."""
        if not self.path.exists():
            return
        with open(self.path) as f:
            lines = [l.strip() for l in f]
        lines = [l for l in lines if l]
        for i, line in enumerate(lines):
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                if i == len(lines) - 1:
                    return  # torn tail: the append never completed
                raise

    def clear(self) -> None:
        if self.path.exists():
            self.path.unlink()
