"""ShardedFlatIndex — exact KNN over a corpus sharded across chips.

The multi-chip form of ``FlatIndex``: vectors are row-sharded over a
1-D mesh (``NamedSharding``); every query batch runs the local top-k on
each chip and merges the [B, k] partials with one ``all_gather`` over
ICI (the standard sharded-ANN pattern, SURVEY.md §5). Comms are
O(B * k * n_shards), never O(B * N).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from muninn_tpu.ops.distance import Metric, parse_metric
from muninn_tpu.parallel.sharded import make_mesh, shard_rows, sharded_exact_search


class ShardedFlatIndex:
    """Append-only exact index sharded across all (or ``n_devices``)
    local devices. API mirrors ``FlatIndex``."""

    def __init__(
        self,
        dim: int,
        metric: Metric | str = Metric.L2,
        *,
        n_devices: int | None = None,
        capacity: int = 4096,
    ):
        self.metric = parse_metric(metric)
        self.dim = int(dim)
        self.mesh = make_mesh(n_devices)
        self.n_shards = self.mesh.devices.size
        capacity = self._round(capacity)
        self.vectors = shard_rows(
            jnp.zeros((capacity, self.dim), jnp.float32), self.mesh
        )
        self.valid = shard_rows(jnp.zeros((capacity,), bool), self.mesh)
        self._slot_of: dict[int, int] = {}
        self._id_of = np.full((capacity,), -1, np.int64)
        self._high = 0

    def _round(self, n: int) -> int:
        q = 8 * self.n_shards
        return ((max(n, q) + q - 1) // q) * q

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    def __len__(self) -> int:
        return len(self._slot_of)

    def insert(self, ids, vectors) -> None:
        ids = np.asarray(ids, np.int64).reshape(-1)
        n = len(ids)
        if len(np.unique(ids)) != n:
            # an intra-batch duplicate would leave a ghost row: both
            # slots valid, _slot_of keeping only the last, so delete()
            # could never invalidate the first
            raise ValueError("duplicate ids within the insert batch")
        for i in ids.tolist():
            if i in self._slot_of:
                raise ValueError(f"duplicate id {i}")
        if self._high + n > self.capacity:
            new_cap = self._round(max(self.capacity * 2, self._high + n))
            pad = new_cap - self.capacity
            self.vectors = shard_rows(
                jnp.pad(self.vectors, ((0, pad), (0, 0))), self.mesh
            )
            self.valid = shard_rows(jnp.pad(self.valid, (0, pad)), self.mesh)
            self._id_of = np.pad(self._id_of, (0, pad), constant_values=-1)
        slots = np.arange(self._high, self._high + n, dtype=np.int32)
        vecs = jnp.asarray(vectors, jnp.float32).reshape(n, self.dim)
        self.vectors = shard_rows(
            jax.lax.dynamic_update_slice(self.vectors, vecs, (self._high, 0)),
            self.mesh,
        )
        self.valid = shard_rows(
            jax.lax.dynamic_update_slice(
                self.valid, jnp.ones((n,), bool), (self._high,)
            ),
            self.mesh,
        )
        self._slot_of.update(zip(ids.tolist(), slots.tolist()))
        self._id_of[slots] = ids
        self._high += n

    def delete(self, ids) -> None:
        ids = np.asarray(ids, np.int64).reshape(-1)
        slots = np.array([self._slot_of[int(i)] for i in ids], np.int32)
        v = self.valid.at[jnp.asarray(slots)].set(False)
        self.valid = shard_rows(v, self.mesh)
        for i in ids.tolist():
            del self._slot_of[i]
        self._id_of[slots] = -1

    def search(self, queries, k: int = 10):
        q = jnp.asarray(queries, jnp.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        d, slots = sharded_exact_search(
            q, self.vectors, self.valid, k, self.metric, self.mesh
        )
        slots = np.asarray(slots)
        ids = np.where(slots >= 0, self._id_of[np.maximum(slots, 0)], -1)
        d = np.asarray(d)
        return (ids[0], d[0]) if single else (ids, d)
