"""Multi-chip sharding: mesh helpers, sharded search/train/analytics."""

from muninn_tpu.parallel.sharded import (
    make_mesh,
    shard_rows,
    sharded_exact_search,
    sharded_ivf_search,
    shard_ivf,
    sharded_hnsw_search,
    shard_hnsw,
    sharded_bfs_depths,
    sharded_components,
    sharded_pagerank,
    sharded_sgns_step,
    sharded_kmeans,
    build_ivf_sharded,
    sharded_bulk_knn,
    build_hnsw_sharded,
)
from muninn_tpu.parallel.multihost import (
    make_mesh2,
    multihost_exact_search,
    multihost_pagerank,
    shard_rows2,
)

__all__ = [
    "make_mesh",
    "shard_rows",
    "sharded_exact_search",
    "sharded_ivf_search",
    "shard_ivf",
    "sharded_hnsw_search",
    "shard_hnsw",
    "sharded_bfs_depths",
    "sharded_components",
    "sharded_pagerank",
    "sharded_sgns_step",
    "sharded_kmeans",
    "build_ivf_sharded",
    "sharded_bulk_knn",
    "build_hnsw_sharded",
    "make_mesh2",
    "shard_rows2",
    "multihost_exact_search",
    "multihost_pagerank",
]
