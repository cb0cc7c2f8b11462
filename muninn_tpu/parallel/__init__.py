"""Multi-chip sharding: mesh helpers, sharded search/train/analytics."""

from muninn_tpu.parallel.sharded import (
    make_mesh,
    shard_rows,
    sharded_exact_search,
    sharded_pagerank,
    sharded_sgns_step,
)

__all__ = [
    "make_mesh",
    "shard_rows",
    "sharded_exact_search",
    "sharded_pagerank",
    "sharded_sgns_step",
]
