"""Device-resident vector store with external-id mapping.

Plays the role of the reference's node hash table + per-node malloc'd
vectors (``src/hnsw_algo.c:38-91``): a padded ``float32[cap, d]`` array
plus a validity mask on device, with the int64 external-id <-> int32
slot mapping kept on host (string/int ids are interned to dense slots at
the API boundary, the way ``graph_adjacency``'s ``_nodes`` registry does).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


from functools import partial


@partial(jax.jit, donate_argnums=(0,))
def _donated_update_rows(buf, rows, start):
    return jax.lax.dynamic_update_slice(buf, rows, (start, 0))


@partial(jax.jit, donate_argnums=(0,))
def _donated_update_flags(buf, flags, start):
    return jax.lax.dynamic_update_slice(buf, flags, (start,))


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class VectorStore:
    """Append-oriented vector storage. Slots are dense int32; external ids
    are arbitrary int64 (the reference's SQLite rowids)."""

    def __init__(self, dim: int, capacity: int = 1024, pad_multiple: int = 1024,
                 dtype=jnp.float32, row_scales: bool = False):
        self.dim = int(dim)
        self.pad_multiple = int(pad_multiple)
        self.dtype = dtype
        capacity = _round_up(max(int(capacity), pad_multiple), pad_multiple)
        self.vectors = jnp.zeros((capacity, self.dim), dtype)
        # per-row dequantization scales (int8 storage mode)
        self.scales = jnp.zeros((capacity,), jnp.float32) if row_scales else None
        self.valid = jnp.zeros((capacity,), bool)
        self._slot_of: dict[int, int] = {}
        self._id_of = np.full((capacity,), -1, np.int64)
        self._count = 0          # live rows
        self._high = 0           # first never-used slot

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    def __len__(self) -> int:
        return self._count

    @property
    def high_watermark(self) -> int:
        return self._high

    def _grow(self, need: int) -> None:
        cap = self.capacity
        new_cap = cap
        while new_cap < need:
            new_cap *= 2
        new_cap = _round_up(new_cap, self.pad_multiple)
        self.vectors = jnp.pad(self.vectors, ((0, new_cap - cap), (0, 0)))
        if self.scales is not None:
            self.scales = jnp.pad(self.scales, (0, new_cap - cap))
        self.valid = jnp.pad(self.valid, (0, new_cap - cap))
        self._id_of = np.pad(self._id_of, (0, new_cap - cap), constant_values=-1)

    def reserve(self, n: int) -> None:
        if self._high + n > self.capacity:
            self._grow(self._high + n)

    def register(self, ids: np.ndarray, reserve_extra: int = 0) -> np.ndarray:
        """Host-only bookkeeping of an append: assigns contiguous slots
        and records the id mapping WITHOUT device writes — the caller
        folds the vector/validity updates into its own fused device step
        (each separate dispatch costs ~0.2-0.4 s through the tunnel).
        Reserves capacity for ``n + reserve_extra`` rows."""
        ids = np.asarray(ids, np.int64)
        n = ids.shape[0]
        id_list = ids.tolist()
        dups = self._slot_of.keys() & set(id_list)
        if dups:
            raise ValueError(f"duplicate id {next(iter(dups))}")
        if len(set(id_list)) != n:
            raise ValueError("duplicate id within batch")
        self.reserve(n + reserve_extra)
        slots = np.arange(self._high, self._high + n, dtype=np.int32)
        self._slot_of.update(zip(id_list, slots.tolist()))
        self._id_of[slots] = ids
        self._high += n
        self._count += n
        return slots

    def add(self, ids: np.ndarray, vectors: np.ndarray | jax.Array) -> np.ndarray:
        """Append a batch. ``ids`` int64 [n]; returns assigned slots int32 [n].
        Duplicate ids raise (reference: SQLITE_CONSTRAINT on dup rowid)."""
        ids = np.asarray(ids, np.int64)
        n = ids.shape[0]
        id_list = ids.tolist()
        dups = self._slot_of.keys() & set(id_list)
        if dups:
            raise ValueError(f"duplicate id {next(iter(dups))}")
        if len(set(id_list)) != n:
            raise ValueError("duplicate id within batch")
        self.reserve(n)
        slots = np.arange(self._high, self._high + n, dtype=np.int32)
        vecs = jnp.asarray(vectors, self.dtype).reshape(n, self.dim)
        # slots are contiguous: dynamic_update_slice, never a scatter.
        # The update DONATES the old buffer (jit donate_argnums): an
        # eager dynamic_update_slice double-buffers the whole store —
        # at a 6 GB store that transient 2x was the difference between
        # fitting and OOM (scale_4m_ivf_probe). CAUTION: donation
        # DELETES the old buffer even if other Python references to it
        # are live (verified empirically — jax does NOT copy-on-share),
        # so long-lived consumers must snapshot ``vectors``/``valid``
        # rather than alias them (``parallel.sharded.shard_ivf`` makes
        # replicated device_put copies for exactly this reason).
        self.vectors = _donated_update_rows(
            self.vectors, vecs, jnp.int32(self._high)
        )
        self.valid = _donated_update_flags(
            self.valid, jnp.ones((n,), bool), jnp.int32(self._high)
        )
        self._slot_of.update(zip(id_list, slots.tolist()))
        self._id_of[slots] = ids
        self._high += n
        self._count += n
        return slots

    def unregister(self, ids: np.ndarray) -> np.ndarray:
        """Host-only bookkeeping of a soft-delete (the ``register``
        counterpart): drops the id mapping and returns the freed slots
        WITHOUT touching the device validity mask — the caller folds
        that into its own fused device step."""
        ids = np.asarray(ids, np.int64)
        slots = np.array([self._slot_of[int(i)] for i in ids], np.int32)
        for i in ids.tolist():
            del self._slot_of[i]
        self._id_of[slots] = -1
        self._count -= len(slots)
        return slots

    def remove(self, ids: np.ndarray) -> np.ndarray:
        """Soft-delete by external id. Returns freed slots (int32).
        Unknown ids raise KeyError."""
        ids = np.asarray(ids, np.int64)
        slots = np.array([self._slot_of[int(i)] for i in ids], np.int32)
        self.valid = self.valid.at[slots].set(False)
        for i in ids.tolist():
            del self._slot_of[i]
        self._id_of[slots] = -1
        self._count -= len(slots)
        return slots

    def slot(self, id_: int) -> int | None:
        return self._slot_of.get(int(id_))

    def slots_of(self, ids) -> np.ndarray:
        return np.array([self._slot_of[int(i)] for i in ids], np.int32)

    def ids_of(self, slots) -> np.ndarray:
        """Map slots back to external ids (-1 for invalid slot / -1 input)."""
        slots = np.asarray(slots)
        out = np.where(slots >= 0, self._id_of[np.maximum(slots, 0)], -1)
        return out

    def get_vector(self, id_: int) -> np.ndarray | None:
        s = self.slot(id_)
        if s is None or not bool(self.valid[s]):
            return None
        return np.asarray(self.vectors[s])
