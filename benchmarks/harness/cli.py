"""Harness CLI: list / prep / manifest / benchmark / run / analyse
(the reference's ``cli.py`` subcommand surface,
``benchmarks/harness/README.md:55-116``)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from benchmarks.harness.core import REGISTRY
from benchmarks.harness import prep as prep_mod
from benchmarks.harness import registry as reg


def main(argv=None):
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores the env var and would grab the
        # exclusive tunnel even for CPU runs; force it off properly
        import jax

        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(prog="benchmarks.harness")
    ap.add_argument(
        "command",
        choices=["list", "prep", "manifest", "benchmark", "run", "analyse"],
    )
    ap.add_argument("treatments", nargs="*", default=[])
    ap.add_argument("--sizes", default="1000,5000")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--id", default=None, help="permutation id (benchmark)")
    ap.add_argument("--missing", action="store_true",
                    help="manifest: only incomplete permutations")
    ap.add_argument("--commands", action="store_true",
                    help="manifest: print runnable commands")
    ap.add_argument("--results-dir", default=None)
    ap.add_argument("--charts-dir", default="benchmarks/charts")
    ap.add_argument("--docs-dir", default="docs/benchmarks")
    args = ap.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]
    results_dir = Path(args.results_dir) if args.results_dir else None

    if args.command == "list":
        for name in REGISTRY:
            print(name)
        return

    if args.command == "prep":
        written = prep_mod.prep(
            sizes, seed=args.seed,
            kinds=args.treatments or None,
        )
        for p in written:
            print(p)
        print(f"{len(written)} cache file(s) written")
        return

    if args.command == "manifest":
        all_rows = reg.permutation_status(sizes, results_dir)
        rows = [(p, d) for p, d in all_rows if not d] if args.missing else all_rows
        for p, done in rows:
            if args.commands:
                print(f"python -m benchmarks.harness benchmark --id {p.perm_id}")
            else:
                print(f"{'done   ' if done else 'missing'}  {p.perm_id}")
        if not args.commands:
            n_done = sum(d for _, d in all_rows)
            print(f"{n_done}/{len(all_rows)} complete", file=sys.stderr)
        return

    if args.command == "analyse":
        from benchmarks.charts import analyse

        paths = args.treatments or ["results.jsonl"]
        charts, docs = analyse(paths, args.charts_dir, args.docs_dir)
        for p in charts + docs:
            print(p)
        return

    rng = np.random.default_rng(args.seed)
    out = open(args.out, "a") if args.out else None
    try:
        if args.command == "benchmark":
            if not args.id:
                ap.error("benchmark requires --id <permutation_id>")
            perms = reg.filter_permutations(sizes, perm_id=args.id)
            if not perms:
                ap.error(f"unknown permutation id {args.id!r} "
                         f"(check `manifest` output for these --sizes)")
            reg.run_permutation(perms[0], rng, out, results_dir)
            return

        # run: every permutation of the chosen treatments
        names = args.treatments or list(REGISTRY)
        for name in names:
            if name not in REGISTRY:
                print(f"unknown treatment {name}", file=sys.stderr)
                continue
            for perm in reg.filter_permutations(sizes, treatment=name):
                reg.run_permutation(perm, rng, out, results_dir)
    finally:
        if out:
            out.close()
