"""Multi-chip sharding: mesh helpers and sharded index/search."""
