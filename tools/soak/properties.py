"""Seed-soak of the randomized property tests (CPU; runs while the
TPU tunnel is down). Each trial re-runs the differential/property
tests with a fresh rng seed; any assertion failure prints the seed
and full traceback so it can be reproduced and fixed.
"""
import sys, traceback, tempfile, time
from pathlib import Path

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
import numpy as np

from tests.test_hnsw import (
    test_hnsw_randomized_churn_differential,
    test_grouped_bounded_append_with_padding,
    test_hnsw_recall_after_delete_wave,
    test_hnsw_no_edges_to_tombstones_after_churn,
)
from tests.test_graph import test_incremental_patch_bit_identical_to_rebuild
from tests.test_persistence import (
    test_graph_cache_incremental_fast_path_matches_replay,
    test_graph_cache_block_granular_save,
)

CASES = [
    ("churn_differential", test_hnsw_randomized_churn_differential, False),
    ("grouped_append_fuzz", test_grouped_bounded_append_with_padding, False),
    ("delete_wave_recall", test_hnsw_recall_after_delete_wave, False),
    ("no_tombstone_edges", test_hnsw_no_edges_to_tombstones_after_churn, False),
    ("csr_patch_vs_rebuild", test_incremental_patch_bit_identical_to_rebuild, False),
    ("delta_fast_vs_replay", test_graph_cache_incremental_fast_path_matches_replay, False),
    ("block_granular_save", test_graph_cache_block_granular_save, True),
]

n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 40
fails = 0
t0 = time.time()
for seed in range(1000, 1000 + n_seeds):
    for name, fn, needs_tmp in CASES:
        rng = np.random.default_rng(seed)
        try:
            if needs_tmp:
                with tempfile.TemporaryDirectory() as td:
                    fn(rng, Path(td))
            else:
                fn(rng)
        except Exception:
            fails += 1
            print(f"FAIL seed={seed} case={name}", flush=True)
            traceback.print_exc()
    print(f"seed {seed} ok ({time.time()-t0:.0f}s)", flush=True)
print(f"done: {n_seeds} seeds, {fails} failures", flush=True)
