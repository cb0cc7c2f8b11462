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
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

DIRECTIONS = ("forward", "reverse", "both")


def _pad_bucket(e: int) -> int:
    """Pow2 capacity bucket: device CSR arrays are padded so that
    incremental deltas and re-loads keep one compiled shape per bucket
    (every novel shape costs a 30-200 s tunnel compile)."""
    return max(64, 1 << int(np.ceil(np.log2(max(e, 1)))))


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
    by ``src``; ``offsets[v]:offsets[v+1]`` slices v's out-edges.

    Arrays are padded to a pow2 capacity with **inert pad edges**
    ``(V, V, w=0)``: they sort after every valid edge (offsets never
    reach them), JAX segment ops drop out-of-range ids, and min-relax
    kernels are unaffected by the clamped self-contribution — so device
    consumers can take the padded arrays as-is at one compiled shape
    per bucket. Host-side consumers must slice via ``host_coo()``.
    ``e_valid`` is the live edge count (== ``offsets[num_nodes]``).
    """

    offsets: jnp.ndarray  # int32 [V+1]
    src: jnp.ndarray      # int32 [E_cap] (sorted; pads = V at the end)
    dst: jnp.ndarray      # int32 [E_cap] (pads = V)
    weights: jnp.ndarray  # float32 [E_cap] (pads = 0)
    e_valid: int

    @property
    def num_nodes(self) -> int:
        return self.offsets.shape[0] - 1

    @property
    def num_edges(self) -> int:
        return self.e_valid

    @property
    def capacity(self) -> int:
        return self.src.shape[0]

    def degrees(self) -> jnp.ndarray:
        return self.offsets[1:] - self.offsets[:-1]

    def host_coo(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Valid edges as host numpy arrays (pads sliced off) — host
        consumers index node-sized arrays with src/dst and would go out
        of bounds on the V-valued pads."""
        e = self.e_valid
        return (
            np.asarray(self.src[:e]),
            np.asarray(self.dst[:e]),
            np.asarray(self.weights[:e]),
        )


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
            if self._fwd is not None and self._rev is not None:
                # both directions already on device: one device-side
                # stable two-way merge, no host sort and no re-upload
                self._both = merge_both_device(self._fwd, self._rev)
            else:
                s = np.concatenate([self._src, self._dst])
                d = np.concatenate([self._dst, self._src])
                w = np.concatenate([self._w, self._w])
                off, ss, dd, ww = build_csr_arrays(s, d, w, self.num_nodes)
                self._both = _to_device_csr(off, ss, dd, ww, self.num_nodes)
        return self._both

    def _build(self, s: np.ndarray, d: np.ndarray) -> DeviceCsr:
        off, ss, dd, ww = build_csr_arrays(s, d, self._w, self.num_nodes)
        return _to_device_csr(off, ss, dd, ww, self.num_nodes)

    def node_index(self, node_id) -> int:
        idx = self.nodes.find(node_id)
        if idx is None:
            raise KeyError(f"unknown node {node_id!r}")
        return idx

    def node_ids(self, indices) -> list:
        return [self.nodes.id_of(int(i)) for i in indices]


def _to_device_csr(
    off: np.ndarray, ss: np.ndarray, dd: np.ndarray, ww: np.ndarray,
    num_nodes: int,
) -> DeviceCsr:
    e = len(ss)
    cap = _pad_bucket(e)
    ss = np.pad(ss, (0, cap - e), constant_values=num_nodes)
    dd = np.pad(dd, (0, cap - e), constant_values=num_nodes)
    ww = np.pad(ww, (0, cap - e))
    return DeviceCsr(
        jnp.asarray(off), jnp.asarray(ss), jnp.asarray(dd), jnp.asarray(ww), e
    )


# ─────────────── device-side incremental CSR maintenance ───────────────
# The reference rewrites only affected 4096-node blocks on incremental
# rebuild (src/graph_adjacency.c:649-1005, src/graph_csr.c:341-478). The
# TPU-native equivalent: the CSR lives in capacity-padded device arrays,
# and a small delta is applied as ONE jitted program — delete-mark +
# compact, then a sorted-merge insert — with O(delta) host work and
# H2D traffic, instead of a full host re-sort + re-upload of [E] arrays.


@partial(jax.jit, static_argnames=("num_nodes", "del_rounds"))
def csr_delta_device(
    offsets: jax.Array,   # [V+1] int32
    src: jax.Array,       # [E_cap] int32 sorted, pads = V
    dst: jax.Array,       # [E_cap] int32, pads = V
    w: jax.Array,         # [E_cap] f32, pads = 0
    e_valid: jax.Array,   # scalar int32
    del_key: jax.Array,   # [Kd] int64 sorted packed src*(V+1)+dst keys;
                          #      pads = int64 max
    ins_src: jax.Array,   # [Ki] int32 sorted by src; pads = V
    ins_dst: jax.Array,   # [Ki] int32; pads = V
    ins_w: jax.Array,     # [Ki] f32
    num_nodes: int,
    del_rounds: int = 1,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Apply (deletes, inserts) to a sorted padded CSR in place.

    Delete semantics match the host replay (graph_csr.c:219-247): each
    delete key removes its first live occurrence in CSR order — which,
    by counting-sort stability, is COO insertion order, so host and
    device stay bit-identical. The first-occurrence pick is sort-free:
    ``del_rounds`` segment-min sweeps (= the max multiplicity of a key
    in the delete batch, usually 1), because a full-array stable sort
    of emulated int64 keys measured ~4x slower than a host rebuild at
    10M edges. Inserts append after existing equal-src edges. Returns
    (offsets, src, dst, w, new_e_valid)."""
    e_cap = src.shape[0]
    kd = del_key.shape[0]
    nn1 = jnp.int64(num_nodes + 1)
    pos_e = jnp.arange(e_cap, dtype=jnp.int32)
    valid_e = pos_e < e_valid

    # ── deletes: per key, its first `multiplicity` occurrences go ──
    key_e = jnp.where(
        valid_e, src.astype(jnp.int64) * nn1 + dst, jnp.int64(2**62)
    )
    lo = jnp.searchsorted(del_key, key_e, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(del_key, key_e, side="right").astype(jnp.int32)
    quota = hi - lo                       # deletes targeting this key
    matched = valid_e & (quota > 0)
    slot = jnp.minimum(lo, kd)           # group id per delete key
    remove = jnp.zeros((e_cap,), bool)
    taken = jnp.zeros((kd + 1,), jnp.int32)
    big = jnp.int32(2**31 - 1)
    for _ in range(del_rounds):
        cand = jnp.where(matched & ~remove, pos_e, big)
        earliest = jax.ops.segment_min(cand, slot, num_segments=kd + 1)
        pick = (
            matched & ~remove & (pos_e == earliest[slot]) & (taken[slot] < quota)
        )
        remove = remove | pick
        taken = taken + jax.ops.segment_sum(
            pick.astype(jnp.int32), slot, num_segments=kd + 1
        )
    keep = valid_e & ~remove
    new_pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    tgt = jnp.where(keep, new_pos, e_cap)
    src2 = jnp.full((e_cap,), num_nodes, jnp.int32).at[tgt].set(src, mode="drop")
    dst2 = jnp.full((e_cap,), num_nodes, jnp.int32).at[tgt].set(dst, mode="drop")
    w2 = jnp.zeros((e_cap,), jnp.float32).at[tgt].set(w, mode="drop")
    e_after = jnp.sum(keep.astype(jnp.int32))
    rem_cnt = jax.ops.segment_sum(
        remove.astype(jnp.int32), src, num_segments=num_nodes
    )
    offsets = offsets - jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(rem_cnt).astype(jnp.int32)]
    )

    # ── inserts: stable sorted merge (new edges after equal-src) ──
    ki = ins_src.shape[0]
    live_i = ins_src < num_nodes
    ipos = jnp.searchsorted(src2, ins_src, side="right").astype(jnp.int32)
    ipos = jnp.minimum(ipos, e_after)  # pads in src2 sort last anyway
    ipos_m = jnp.where(live_i, ipos, jnp.int32(2**31 - 1))
    ins_tgt = jnp.where(live_i, ipos + jnp.arange(ki, dtype=jnp.int32), e_cap)
    shift = jnp.searchsorted(ipos_m, pos_e, side="right").astype(jnp.int32)
    old_tgt = jnp.where(pos_e < e_after, pos_e + shift, e_cap)
    src3 = (
        jnp.full((e_cap,), num_nodes, jnp.int32)
        .at[old_tgt].set(src2, mode="drop")
        .at[ins_tgt].set(ins_src, mode="drop")
    )
    dst3 = (
        jnp.full((e_cap,), num_nodes, jnp.int32)
        .at[old_tgt].set(dst2, mode="drop")
        .at[ins_tgt].set(ins_dst, mode="drop")
    )
    w3 = (
        jnp.zeros((e_cap,), jnp.float32)
        .at[old_tgt].set(w2, mode="drop")
        .at[ins_tgt].set(ins_w, mode="drop")
    )
    ins_cnt = jax.ops.segment_sum(
        live_i.astype(jnp.int32), ins_src, num_segments=num_nodes
    )
    offsets = offsets + jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(ins_cnt).astype(jnp.int32)]
    )
    e_new = e_after + jnp.sum(live_i.astype(jnp.int32))
    return offsets, src3, dst3, w3, e_new


@jax.jit
def _merge_sorted_pair(
    a_src, a_dst, a_w, b_src, b_dst, b_w
):
    """Stable two-way merge of two src-sorted padded COO sets (a's
    entries precede b's on equal src; pads sort last in both)."""
    ca, cb = a_src.shape[0], b_src.shape[0]
    ia = jnp.arange(ca, dtype=jnp.int32)
    ib = jnp.arange(cb, dtype=jnp.int32)
    ta = ia + jnp.searchsorted(b_src, a_src, side="left").astype(jnp.int32)
    tb = ib + jnp.searchsorted(a_src, b_src, side="right").astype(jnp.int32)
    n = ca + cb
    src = jnp.zeros((n,), jnp.int32).at[ta].set(a_src).at[tb].set(b_src)
    dst = jnp.zeros((n,), jnp.int32).at[ta].set(a_dst).at[tb].set(b_dst)
    w = jnp.zeros((n,), jnp.float32).at[ta].set(a_w).at[tb].set(b_w)
    return src, dst, w


def merge_both_device(fwd: DeviceCsr, rev: DeviceCsr) -> DeviceCsr:
    """'both'-direction CSR from the fwd and rev device CSRs by one
    device merge — matches the host build's stable order (forward
    orientations before reverse copies on equal src)."""
    src, dst, w = _merge_sorted_pair(
        fwd.src, fwd.dst, fwd.weights, rev.src, rev.dst, rev.weights
    )
    return DeviceCsr(
        fwd.offsets + rev.offsets, src, dst, w, fwd.e_valid + rev.e_valid
    )
