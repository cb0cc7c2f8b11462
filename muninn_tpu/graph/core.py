"""Graph core: node interning, edge lists, device-resident CSR/COO.

TPU-native replacement for the reference's ``src/graph_load.c``
(string-id hash map + adjacency lists) and ``src/graph_csr.c``
(CSR build / delta merge / blocked storage):

- Node ids (strings or ints) are interned to dense ``int32`` indices at
  the API boundary (``NodeTable``), the way the reference's
  ``graph_adjacency`` ``_nodes`` registry does — never in hot paths.
- The device representation is a **sorted COO + offsets** pair (which
  *is* CSR): ``src[E], dst[E], w[E]`` sorted by src, plus
  ``offsets[V+1]``. Edge-parallel segment ops (the TPU replacement for
  pointer-chasing neighbor loops) consume the COO arrays directly; the
  offsets serve degree queries and neighbor slicing.
- Both directions are kept (forward = sorted by src, reverse = sorted
  by dst re-labeled as src) mirroring the reference's fwd/rev CSR pair
  (``src/graph_csr.c:20-83``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

DIRECTIONS = ("forward", "reverse", "both")


class NodeTable:
    """Dense interning of arbitrary hashable node ids -> int32 indices.

    Reference analogue: DJB2 + linear-probing hash map in
    ``src/graph_load.c:56-123``. Python's dict plays that role on host;
    indices are what reach the device.
    """

    def __init__(self):
        self._index: dict = {}
        self._ids: list = []

    def __len__(self) -> int:
        return len(self._ids)

    def find_or_add(self, node_id) -> int:
        idx = self._index.get(node_id)
        if idx is None:
            idx = len(self._ids)
            self._index[node_id] = idx
            self._ids.append(node_id)
        return idx

    def find(self, node_id) -> int | None:
        return self._index.get(node_id)

    def id_of(self, idx: int):
        return self._ids[idx]

    def intern_many(self, ids) -> np.ndarray:
        return np.fromiter(
            (self.find_or_add(i) for i in ids), np.int32, count=len(ids)
        )

    @property
    def ids(self) -> list:
        return self._ids


@dataclass
class DeviceCsr:
    """One direction of the graph on device. ``src``/``dst`` are sorted
    by ``src``; ``offsets[v]:offsets[v+1]`` slices v's out-edges."""

    offsets: jnp.ndarray  # int32 [V+1]
    src: jnp.ndarray      # int32 [E] (sorted)
    dst: jnp.ndarray      # int32 [E]
    weights: jnp.ndarray  # float32 [E]

    @property
    def num_nodes(self) -> int:
        return self.offsets.shape[0] - 1

    @property
    def num_edges(self) -> int:
        return self.src.shape[0]

    def degrees(self) -> jnp.ndarray:
        return self.offsets[1:] - self.offsets[:-1]


def build_csr_arrays(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, num_nodes: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host CSR build via the native O(E+V) counting sort
    (``muninn_tpu/native``, the ``src/graph_csr.c:20-83`` role), with a
    numpy fallback inside."""
    from muninn_tpu import native

    return native.csr_build(src, dst, w, num_nodes)


class Graph:
    """In-memory graph over interned nodes, with device CSR both ways.

    ``from_edges`` mirrors the reference TVF loader semantics
    (``graph_data_load``, ``src/graph_load.c:164-245``): arbitrary node
    ids, optional weights, optional temporal filter, direction handling
    via the fwd/rev CSR pair. Analytics methods live in
    ``muninn_tpu.graph.api.Graph`` (subclass).
    """

    def __init__(
        self,
        nodes: NodeTable,
        src_idx: np.ndarray,
        dst_idx: np.ndarray,
        weights: np.ndarray | None,
    ):
        self.nodes = nodes
        n = len(nodes)
        e = len(src_idx)
        self._src = src_idx.astype(np.int32)
        self._dst = dst_idx.astype(np.int32)
        self._w = (
            np.ones(e, np.float32) if weights is None
            else np.asarray(weights, np.float32)
        )
        self.has_weights = weights is not None
        self._fwd: DeviceCsr | None = None
        self._rev: DeviceCsr | None = None

    # ── construction ──

    @classmethod
    def from_edges(
        cls,
        src_ids,
        dst_ids,
        weights=None,
        *,
        timestamps=None,
        time_start=None,
        time_end=None,
        nodes: NodeTable | None = None,
    ) -> "Graph":
        """Build from parallel src/dst id sequences.

        ``timestamps`` + ``time_start``/``time_end`` mirror the
        reference's temporal WHERE filtering
        (``src/graph_load.c:164-212``): edges outside the window are
        dropped before interning.

        Integer numpy id arrays take a vectorized interning fast path
        (np.unique) — required at the 10M-edge scale; arbitrary
        hashables go through the NodeTable dict.
        """
        # numpy-integer fast path
        np_fast = (
            nodes is None
            and isinstance(src_ids, np.ndarray)
            and isinstance(dst_ids, np.ndarray)
            and np.issubdtype(src_ids.dtype, np.integer)
            and np.issubdtype(dst_ids.dtype, np.integer)
        )
        if not np_fast:
            src_ids = list(src_ids)
            dst_ids = list(dst_ids)
        if len(src_ids) != len(dst_ids):
            raise ValueError("src/dst length mismatch")
        keep = None
        if timestamps is not None:
            ts = np.asarray(timestamps, np.float64)
            keep = np.ones(len(src_ids), bool)
            if time_start is not None:
                keep &= ts >= time_start
            if time_end is not None:
                keep &= ts <= time_end
        if weights is not None:
            weights = np.asarray(weights, np.float32)
            if keep is not None:
                weights = weights[keep]
        if keep is not None:
            if np_fast:
                src_ids = src_ids[keep]
                dst_ids = dst_ids[keep]
            else:
                src_ids = [s for s, k in zip(src_ids, keep) if k]
                dst_ids = [s for s, k in zip(dst_ids, keep) if k]
        if np_fast:
            combined = np.concatenate([src_ids, dst_ids])
            uniq, inv = np.unique(combined, return_inverse=True)
            table = NodeTable()
            table._ids = [int(u) for u in uniq]
            table._index = {int(u): i for i, u in enumerate(uniq)}
            si = inv[: len(src_ids)].astype(np.int32)
            di = inv[len(src_ids):].astype(np.int32)
            return cls(table, si, di, weights)
        table = nodes if nodes is not None else NodeTable()
        si = table.intern_many(src_ids)
        di = table.intern_many(dst_ids)
        return cls(table, si, di, weights)

    # ── views ──

    @property
    def num_nodes(self) -> int:
        return len(self.nodes)

    @property
    def num_edges(self) -> int:
        return len(self._src)

    def csr(self, direction: str = "forward") -> DeviceCsr:
        """Direction semantics match the reference
        (``src/graph_load.c:215-245``): 'forward' follows src->dst,
        'reverse' follows dst->src, 'both' treats edges as undirected
        (each edge present in both orientations)."""
        if direction not in DIRECTIONS:
            raise ValueError(f"direction must be one of {DIRECTIONS}")
        if direction == "forward":
            if self._fwd is None:
                self._fwd = self._build(self._src, self._dst)
            return self._fwd
        if direction == "reverse":
            if self._rev is None:
                self._rev = self._build(self._dst, self._src)
            return self._rev
        if not hasattr(self, "_both") or self._both is None:
            s = np.concatenate([self._src, self._dst])
            d = np.concatenate([self._dst, self._src])
            w = np.concatenate([self._w, self._w])
            off, ss, dd, ww = build_csr_arrays(s, d, w, self.num_nodes)
            self._both = DeviceCsr(
                jnp.asarray(off), jnp.asarray(ss), jnp.asarray(dd), jnp.asarray(ww)
            )
        return self._both

    def _build(self, s: np.ndarray, d: np.ndarray) -> DeviceCsr:
        off, ss, dd, ww = build_csr_arrays(s, d, self._w, self.num_nodes)
        return DeviceCsr(
            jnp.asarray(off), jnp.asarray(ss), jnp.asarray(dd), jnp.asarray(ww)
        )

    def node_index(self, node_id) -> int:
        idx = self.nodes.find(node_id)
        if idx is None:
            raise KeyError(f"unknown node {node_id!r}")
        return idx

    def node_ids(self, indices) -> list:
        return [self.nodes.id_of(int(i)) for i in indices]
