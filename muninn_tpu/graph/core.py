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
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

DIRECTIONS = ("forward", "reverse", "both")

#: padded edge capacities above this drop the device COO once a CSR
#: direction is built (`Graph._build_device`): at 100M edges the
#: padded src+dst are 2x537 MB of the axon worker's ~3 GB peak-HBM
#: budget, and the second direction's device sort crashes the worker
#: with them still resident
LEAN_COO_DROP_ABOVE = 2**25


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


class IdentityNodeTable:
    """Node ids ARE the dense indices ``0..n-1``.

    Used by :meth:`Graph.from_device_edges`, where materializing a
    python list/dict of 10M+ interned ids would dwarf the graph itself
    (and serve no purpose — device-generated graphs are already dense).
    API-compatible with :class:`NodeTable` for lookups; the table is
    fixed-size, so ``find_or_add`` of an out-of-range id raises.
    """

    def __init__(self, n: int):
        self._n = int(n)

    def __len__(self) -> int:
        return self._n

    def find(self, node_id) -> int | None:
        try:
            i = int(node_id)
        except (TypeError, ValueError):
            return None
        return i if 0 <= i < self._n else None

    def find_or_add(self, node_id) -> int:
        i = self.find(node_id)
        if i is None:
            raise KeyError(
                f"identity node table is fixed at {self._n} nodes; "
                f"cannot intern {node_id!r}"
            )
        return i

    def id_of(self, idx: int) -> int:
        return int(idx)

    def intern_many(self, ids) -> np.ndarray:
        a = np.asarray(ids, np.int64)
        if a.size and (a.min() < 0 or a.max() >= self._n):
            raise KeyError("node id out of range for identity table")
        return a.astype(np.int32)

    @property
    def ids(self) -> range:
        return range(self._n)


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

    ``src`` and ``weights`` may be **None** on device-scale builds
    (``Graph.from_device_edges``): ``src`` is redundant with
    ``offsets`` (reconstructable by a searchsorted) and an unweighted
    graph's ones-vector is 537 MB of dead HBM at 100M edges — against
    the axon worker's ~3 GB peak ceiling. Consumers that genuinely
    need the arrays call :meth:`s` / :meth:`w`, which materialize
    (and cache) on demand; the pull fixpoints never do.
    """

    offsets: jnp.ndarray          # int32 [V+1]
    src: jnp.ndarray | None       # int32 [E_cap] (sorted; pads = V) or None
    dst: jnp.ndarray | None       # int32 [E_cap] (pads = V)
    weights: jnp.ndarray | None   # float32 [E_cap] (pads = 0) or None
    e_valid: int
    #: host-known max segment length (upper bound OK) — sets the STATIC
    #: pass count of the shift-doubling segment reductions
    max_deg: int = 1

    @property
    def num_nodes(self) -> int:
        return self.offsets.shape[0] - 1

    @property
    def num_edges(self) -> int:
        return self.e_valid

    @property
    def capacity(self) -> int:
        return self.dst.shape[0]

    def degrees(self) -> jnp.ndarray:
        return self.offsets[1:] - self.offsets[:-1]

    def s(self) -> jnp.ndarray:
        """The sorted key array, materializing from ``offsets`` when a
        lean device build dropped it (pads land at exactly V because
        ``offsets[-1] == e_valid``)."""
        if self.src is None:
            self.src = _src_from_offsets(self.offsets, self.capacity)
        return self.src

    def w(self) -> jnp.ndarray:
        """Edge weights, materializing the implicit ones (pads 0) for
        an unweighted lean build."""
        if self.weights is None:
            pos = jnp.arange(self.capacity, dtype=jnp.int32)
            self.weights = jnp.where(pos < self.e_valid, 1.0, 0.0).astype(
                jnp.float32
            )
        return self.weights

    def host_coo(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Valid edges as host numpy arrays (pads sliced off) — host
        consumers index node-sized arrays with src/dst and would go out
        of bounds on the V-valued pads."""
        e = self.e_valid
        return (
            np.asarray(self.s()[:e]),
            np.asarray(self.dst[:e]),
            np.asarray(self.w()[:e]),
        )


@partial(jax.jit, static_argnames=("capacity",))
def _src_from_offsets(offsets: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Reconstruct the sorted key array from CSR offsets, in chunked
    slices so peak temporaries stay bounded at 100M-edge capacities."""
    chunk = min(capacity, 2**24)

    def body(k, out):
        cstart = k * chunk
        pos = cstart + jnp.arange(chunk, dtype=jnp.int32)
        s = (jnp.searchsorted(offsets, pos, side="right") - 1).astype(
            jnp.int32
        )
        return jax.lax.dynamic_update_slice(out, s, (cstart,))

    return jax.lax.fori_loop(
        0, capacity // chunk, body, jnp.zeros((capacity,), jnp.int32)
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

    # class-level defaults: some construction paths build a Graph via
    # ``__new__`` + attribute assignment (GraphCache.graph()) and never
    # run ``__init__``
    _dev_coo: tuple | None = None
    _e_dev: int = 0
    _src_np = None
    _dst_np = None
    _w_np = None

    def __init__(
        self,
        nodes: NodeTable,
        src_idx: np.ndarray,
        dst_idx: np.ndarray,
        weights: np.ndarray | None,
    ):
        self.nodes = nodes
        e = len(src_idx)
        self._dev_coo: tuple | None = None
        self._e_dev = 0
        self._src = src_idx.astype(np.int32)
        self._dst = dst_idx.astype(np.int32)
        self._w = (
            np.ones(e, np.float32) if weights is None
            else np.asarray(weights, np.float32)
        )
        self.has_weights = weights is not None
        self._fwd: DeviceCsr | None = None
        self._rev: DeviceCsr | None = None
        self._host_csr: dict[str, tuple] = {}

    # host COO mirrors: plain numpy arrays for host-built graphs, lazy
    # (downloaded once on first touch) for device-built graphs
    @property
    def _src(self) -> np.ndarray:
        if self._src_np is None:
            self._materialize_host()
        return self._src_np

    @_src.setter
    def _src(self, v) -> None:
        self._src_np = v

    @property
    def _dst(self) -> np.ndarray:
        if self._dst_np is None:
            self._materialize_host()
        return self._dst_np

    @_dst.setter
    def _dst(self, v) -> None:
        self._dst_np = v

    @property
    def _w(self) -> np.ndarray:
        if self._w_np is None:
            self._materialize_host()
        return self._w_np

    @_w.setter
    def _w(self, v) -> None:
        self._w_np = v

    def _materialize_host(self) -> None:
        """Download the device COO once (pads sliced off). Only reached
        from a device-built graph when a host-side consumer touches the
        mirrors — a deliberate, one-time cost (the tunnel downloads at
        ~50 MB/s; at 100M edges that is minutes, so device-scale
        workloads should stay on ``backend='device'`` paths)."""
        e = self._e_dev
        if self._dev_coo is not None:
            js, jd, jw = self._dev_coo
            self._src_np = np.asarray(js[:e], np.int32)
            self._dst_np = np.asarray(jd[:e], np.int32)
            self._w_np = (
                np.ones(e, np.float32) if jw is None
                else np.asarray(jw[:e], np.float32)
            )
            return
        # lean regime: the padded COO was dropped once a CSR direction
        # existed — download the edge list from the CSR instead (same
        # edge multiset; order is key-sorted rather than input-order)
        c = self._fwd if self._fwd is not None else self._rev
        a = np.asarray(c.s()[:e], np.int32)
        b = np.asarray(c.dst[:e], np.int32)
        self._src_np, self._dst_np = (a, b) if c is self._fwd else (b, a)
        self._w_np = np.asarray(c.w()[:e], np.float32)

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
        # numpy-integer fast path (also catches python-int lists: the
        # asarray probe is ~50x cheaper than dict interning 10M ids)
        np_fast = nodes is None
        if np_fast and not (
            isinstance(src_ids, np.ndarray)
            and isinstance(dst_ids, np.ndarray)
        ):
            try:
                sa = np.asarray(src_ids)
                da = np.asarray(dst_ids)
                if (np.issubdtype(sa.dtype, np.integer)
                        and np.issubdtype(da.dtype, np.integer)):
                    src_ids, dst_ids = sa, da
                else:
                    np_fast = False
            except (ValueError, TypeError):
                np_fast = False
        np_fast = (
            np_fast
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
            lo = int(combined.min()) if combined.size else 0
            hi = int(combined.max()) if combined.size else 0
            span = hi - lo + 1
            if 0 < span <= max(4 * combined.size, 1 << 22):
                # bounded-range ids: flag-array interning is O(E + span)
                # vs np.unique's sort (3.4 s vs 0.1 s at 5M edges)
                seen = np.zeros(span, bool)
                seen[combined - lo] = True
                remap = np.cumsum(seen, dtype=np.int64) - 1
                uniq = np.nonzero(seen)[0] + lo
                inv = remap[combined - lo]
            else:
                uniq, inv = np.unique(combined, return_inverse=True)
            table = NodeTable()
            table._ids = uniq.tolist()
            table._index = {u: i for i, u in enumerate(table._ids)}
            si = inv[: len(src_ids)].astype(np.int32)
            di = inv[len(src_ids):].astype(np.int32)
            return cls(table, si, di, weights)
        table = nodes if nodes is not None else NodeTable()
        si = table.intern_many(src_ids)
        di = table.intern_many(dst_ids)
        return cls(table, si, di, weights)

    @classmethod
    def from_device_edges(
        cls, src, dst, *, num_nodes: int, weights=None
    ) -> "Graph":
        """Build from DEVICE-RESIDENT dense int32 edge arrays — nothing
        crosses the host boundary.

        This is the constructor for device-scale graphs (10M+ nodes,
        100M+ edges): edges generated on device (e.g. ``jax.random``)
        stay on device, the CSR is built by a device stable sort, and
        node ids are the dense indices themselves
        (:class:`IdentityNodeTable`). The host COO mirrors are lazy —
        host-fast-path analytics and persistence still work, but pay a
        one-time download. Ids must already be in ``[0, num_nodes)``;
        arbitrary external ids (interning) are a host concept, use
        :meth:`from_edges`.
        """
        js = jnp.asarray(src, jnp.int32)
        jd = jnp.asarray(dst, jnp.int32)
        if js.shape != jd.shape or js.ndim != 1:
            raise ValueError("src/dst must be equal-length 1-D arrays")
        e = int(js.shape[0])
        cap = _pad_bucket(e)
        pad = ((0, cap - e),)
        jw = None
        if weights is not None:
            jw = jnp.pad(jnp.asarray(weights, jnp.float32), pad)
        # inert pads (V, V, 0): sort after every valid edge
        js = jnp.pad(js, pad, constant_values=num_nodes)
        jd = jnp.pad(jd, pad, constant_values=num_nodes)
        g = cls(IdentityNodeTable(num_nodes), np.zeros(0, np.int32),
                np.zeros(0, np.int32), None)
        g._dev_coo = (js, jd, jw)
        g._e_dev = e
        g._src = g._dst = g._w = None  # lazy mirrors
        g.has_weights = weights is not None
        return g

    # ── views ──

    @property
    def num_nodes(self) -> int:
        return len(self.nodes)

    @property
    def num_edges(self) -> int:
        if self._src_np is None:
            return self._e_dev
        return len(self._src_np)

    @property
    def device_native(self) -> bool:
        """True while this graph's edges live only on device (built by
        :meth:`from_device_edges`, host mirrors never materialized) —
        either as the padded COO or, after the lean-regime drop, as the
        built CSR directions."""
        return self._src_np is None and (
            self._dev_coo is not None
            or self._fwd is not None
            or self._rev is not None
        )

    def csr(self, direction: str = "forward") -> DeviceCsr:
        """Direction semantics match the reference
        (``src/graph_load.c:215-245``): 'forward' follows src->dst,
        'reverse' follows dst->src, 'both' treats edges as undirected
        (each edge present in both orientations)."""
        if direction not in DIRECTIONS:
            raise ValueError(f"direction must be one of {DIRECTIONS}")
        dev = self.device_native
        if direction == "forward":
            if self._fwd is None:
                self._fwd = (
                    self._build_device(0) if dev
                    else self._build(self._src, self._dst)
                )
            return self._fwd
        if direction == "reverse":
            if self._rev is None:
                self._rev = (
                    self._build_device(1) if dev
                    else self._build(self._dst, self._src)
                )
            return self._rev
        if dev and (self._fwd is None or self._rev is None):
            self.csr("forward")
            self.csr("reverse")
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

    def _build_device(self, flip: int) -> DeviceCsr:
        """CSR by device stable sort over the device COO — same edge
        order as the host counting sort (``native.csr_build``): grouped
        by key node, input order preserved within a group, pads last.
        ``flip=1`` builds the reverse direction (sort by dst).

        LEAN build: the sorted key array is dropped (``offsets`` encode
        it; ``DeviceCsr.s()`` reconstructs on demand) and an unweighted
        graph carries ``weights=None`` — at 100M edges each avoided
        [E_cap] array is 537 MB of the worker's ~3 GB peak budget.

        Once the padded COO has been dropped (lean regime), the
        opposite direction is DERIVED from the built CSR — its entries
        are the same edge set as (key, val, w) triples. Within-row
        order then comes out opposite-endpoint-ascending instead of
        input-order; the device analytics are row-order-independent."""
        if self._dev_coo is not None:
            js, jd, jw = self._dev_coo
            s, d, w = ((jd, js, jw) if flip else (js, jd, jw))
            if s.shape[0] > LEAN_COO_DROP_ABOVE:
                # lean regime: the COO is never read again (the
                # opposite direction derives from this CSR) — drop it
                # and donate its buffers to the sort
                self._dev_coo = None
                donate = (0, 1) if w is None else (0, 1, 2)
            else:
                donate = ()
        else:
            other = self._rev if flip == 0 else self._fwd
            s = other.dst
            # other's key array, WITHOUT caching it on `other` (the
            # reconstruction is a one-shot sort input here; caching
            # would keep an extra [E_cap] resident for the graph's
            # lifetime) — donated to the sort for the same reason
            if other.src is not None:
                d, donate = other.src, ()
            else:
                d = _src_from_offsets(other.offsets, other.capacity)
                donate = (1,)
            w = other.weights
        off, dd, ww = _sort_csr_jit(donate)(s, d, w, self.num_nodes)
        max_deg = int(jnp.max(off[1:] - off[:-1]))
        return DeviceCsr(off, None, dd, ww, self._e_dev, max(max_deg, 1))

    def host_coo(self, direction: str = "forward"):
        """(src, dst, w) numpy COO in the requested direction with NO
        device involvement — the small-graph host fast path must never
        pay a tunnel dispatch. 'both' doubles each edge."""
        if direction not in DIRECTIONS:
            raise ValueError(f"direction must be one of {DIRECTIONS}")
        if direction == "forward":
            return self._src, self._dst, self._w
        if direction == "reverse":
            return self._dst, self._src, self._w
        return (
            np.concatenate([self._src, self._dst]),
            np.concatenate([self._dst, self._src]),
            np.concatenate([self._w, self._w]),
        )

    def host_csr(self, direction: str = "forward"):
        """(offsets, src, dst, w) numpy CSR via the native counting
        sort, cached per direction. Device arrays are untouched."""
        hit = self._host_csr.get(direction)
        if hit is None:
            s, d, w = self.host_coo(direction)
            hit = build_csr_arrays(s, d, w, self.num_nodes)
            self._host_csr[direction] = hit
        return hit

    def node_index(self, node_id) -> int:
        idx = self.nodes.find(node_id)
        if idx is None:
            raise KeyError(f"unknown node {node_id!r}")
        return idx

    def node_ids(self, indices) -> list:
        return [self.nodes.id_of(int(i)) for i in indices]


def _sort_csr_impl(s, d, w, num_nodes: int):
    """Sort a padded device COO by ``s`` (stable) and derive offsets.
    Pads carry ``s == num_nodes`` so they sort to the tail; offsets stop
    at the first pad. One compiled program per (capacity, num_nodes).
    ``w=None`` (unweighted lean build) sorts (key, val) directly —
    no permutation vector, no [E] random gathers — and returns ``None``
    weights. The sorted key array is NOT an output: XLA frees it inside
    the program once the searchsorted consumes it, which matters at
    134M-edge capacities where every [E_cap] temporary is 537 MB of the
    worker's ~3 GB peak budget."""
    if w is None:
        ss, dd = jax.lax.sort_key_val(s, d, is_stable=True)
        ww = None
    else:
        order = jnp.argsort(s, stable=True).astype(jnp.int32)
        ss, dd, ww = s[order], d[order], w[order]
    off = jnp.searchsorted(
        ss, jnp.arange(num_nodes + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return off, dd, ww


@lru_cache(maxsize=None)
def _sort_csr_jit(donate: tuple):
    """Jitted :func:`_sort_csr_impl` with the given ``donate_argnums``.
    Lean-regime builds donate the [E_cap] buffers they will never read
    again so the sort's outputs alias them — at 134M edges each donated
    buffer cuts the program's peak by 537 MB."""
    return jax.jit(
        _sort_csr_impl, static_argnames=("num_nodes",),
        donate_argnums=donate,
    )


def _device_sort_csr(s, d, w, num_nodes: int):
    return _sort_csr_jit(())(s, d, w, num_nodes)


def _to_device_csr(
    off: np.ndarray, ss: np.ndarray, dd: np.ndarray, ww: np.ndarray,
    num_nodes: int,
) -> DeviceCsr:
    e = len(ss)
    cap = _pad_bucket(e)
    ss = np.pad(ss, (0, cap - e), constant_values=num_nodes)
    dd = np.pad(dd, (0, cap - e), constant_values=num_nodes)
    ww = np.pad(ww, (0, cap - e))
    max_deg = int(np.max(np.diff(off))) if num_nodes > 0 else 1
    return DeviceCsr(
        jnp.asarray(off), jnp.asarray(ss), jnp.asarray(dd), jnp.asarray(ww),
        e, max_deg,
    )


# ─────────────── device-side incremental CSR maintenance ───────────────
# The reference rewrites only affected 4096-node blocks on incremental
# rebuild (src/graph_adjacency.c:649-1005, src/graph_csr.c:341-478). The
# TPU-native equivalent: the CSR lives in capacity-padded device arrays,
# and a small delta is applied as ONE jitted program — delete-mark +
# compact, then a sorted-merge insert — with O(delta) host work and
# H2D traffic, instead of a full host re-sort + re-upload of [E] arrays.


@partial(jax.jit, static_argnames=("num_nodes",))
def csr_patch_positions(
    offsets: jax.Array,   # [V+1] int32
    src: jax.Array,       # [E_cap] int32 sorted, pads = V
    dst: jax.Array,       # [E_cap] int32, pads = V
    w: jax.Array,         # [E_cap] f32, pads = 0
    del_pos: jax.Array,   # [Kd] int32 CSR positions to remove; pads = E_cap
    del_src: jax.Array,   # [Kd] int32 src at each removed position; pads = V
    ins_src: jax.Array,   # [Ki] int32 sorted by src; pads = V
    ins_dst: jax.Array,   # [Ki] int32; pads = V
    ins_w: jax.Array,     # [Ki] f32
    num_nodes: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Apply (deletes-by-position, inserts) to a sorted padded CSR.

    The HOST decides which CSR slots die: it mirrors the device order
    bit-exactly (see GraphCache._patch_device), so finding a delete's
    first live (src, dst) occurrence is a tiny host lookup — the device
    never does key matching. (An earlier formulation matched packed
    int64 keys on device with searchsorted: 64-bit emulation made those
    two searches ~2.7s at 10M edges on v5e. Large 1D scatters are
    similarly pathological, so compaction + insert-merge happen in ONE
    multi-operand int32 lax.sort keyed by (masked src, stable rank) —
    ~85ms at 16M slots. Ranks: surviving edges keep their position,
    inserts rank E_cap+i, so inserts land after existing equal-src
    edges — identical to the host replay (graph_csr.c:219-247).)

    Returns (offsets, src, dst, w, new_e_valid)."""
    e_cap = src.shape[0]
    ki = ins_src.shape[0]
    pos_e = jnp.arange(e_cap, dtype=jnp.int32)
    remove = jnp.zeros((e_cap,), bool).at[del_pos].set(True, mode="drop")
    keep = (src < num_nodes) & ~remove
    live_i = ins_src < num_nodes

    comb_src = jnp.concatenate(
        [jnp.where(keep, src, num_nodes),
         jnp.where(live_i, ins_src, num_nodes)]
    )
    comb_rank = jnp.concatenate(
        [pos_e, e_cap + jnp.arange(ki, dtype=jnp.int32)]
    )
    comb_dst = jnp.concatenate(
        [jnp.where(keep, dst, num_nodes),
         jnp.where(live_i, ins_dst, num_nodes)]
    )
    comb_w = jnp.concatenate(
        [jnp.where(keep, w, 0.0), jnp.where(live_i, ins_w, 0.0)]
    )
    ss, _, dd3, ww3 = jax.lax.sort(
        (comb_src, comb_rank, comb_dst, comb_w), num_keys=2
    )
    # live count <= e_cap (caller checks), so the dropped tail is pads
    src3, dst3, w3 = ss[:e_cap], dd3[:e_cap], ww3[:e_cap]

    ones_d = (del_src < num_nodes).astype(jnp.int32)
    rem_cnt = jax.ops.segment_sum(ones_d, del_src, num_segments=num_nodes)
    ins_cnt = jax.ops.segment_sum(
        live_i.astype(jnp.int32), ins_src, num_segments=num_nodes
    )
    delta = jnp.cumsum(ins_cnt - rem_cnt).astype(jnp.int32)
    offsets = offsets + jnp.concatenate([jnp.zeros(1, jnp.int32), delta])
    e_new = jnp.sum(keep.astype(jnp.int32)) + jnp.sum(live_i.astype(jnp.int32))
    return offsets, src3, dst3, w3, e_new


@jax.jit
def _merge_sorted_pair(
    a_src, a_dst, a_w, b_src, b_dst, b_w
):
    """Stable two-way merge of two src-sorted padded COO sets (a's
    entries precede b's on equal src; pads sort last in both).
    ``a_w``/``b_w`` may both be ``None`` (unweighted lean CSRs) — the
    merged weights are then ``None`` too."""
    ca, cb = a_src.shape[0], b_src.shape[0]
    ia = jnp.arange(ca, dtype=jnp.int32)
    ib = jnp.arange(cb, dtype=jnp.int32)
    ta = ia + jnp.searchsorted(b_src, a_src, side="left").astype(jnp.int32)
    tb = ib + jnp.searchsorted(a_src, b_src, side="right").astype(jnp.int32)
    n = ca + cb
    src = jnp.zeros((n,), jnp.int32).at[ta].set(a_src).at[tb].set(b_src)
    dst = jnp.zeros((n,), jnp.int32).at[ta].set(a_dst).at[tb].set(b_dst)
    w = (
        None if a_w is None and b_w is None
        else jnp.zeros((n,), jnp.float32)
        .at[ta].set(a_w if a_w is not None else jnp.ones((ca,), jnp.float32))
        .at[tb].set(b_w if b_w is not None else jnp.ones((cb,), jnp.float32))
    )
    return src, dst, w


def merge_both_device(fwd: DeviceCsr, rev: DeviceCsr) -> DeviceCsr:
    """'both'-direction CSR from the fwd and rev device CSRs by one
    device merge — matches the host build's stable order (forward
    orientations before reverse copies on equal src)."""
    src, dst, w = _merge_sorted_pair(
        fwd.s(), fwd.dst, fwd.weights, rev.s(), rev.dst, rev.weights
    )
    return DeviceCsr(
        fwd.offsets + rev.offsets, src, dst, w, fwd.e_valid + rev.e_valid,
        fwd.max_deg + rev.max_deg,
    )
