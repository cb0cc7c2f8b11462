"""Treatment-pattern benchmark harness.

Mirrors the reference's ``benchmarks/harness`` design
(``benchmarks/harness/README.md``): a registry of treatment x
permutation cells executed in a consistent prepare/run lifecycle,
producing JSONL records, per-permutation artifact directories, and
Plotly chart JSONs + rendered markdown docs.

Lifecycle subcommands (reference ``cli.py`` roles):

    python -m benchmarks.harness list                 # treatments
    python -m benchmarks.harness prep [--sizes ...]   # data caches
    python -m benchmarks.harness manifest [--missing] [--commands]
    python -m benchmarks.harness benchmark --id <permutation_id>
    python -m benchmarks.harness run [treatment ...] [--out results.jsonl]
    python -m benchmarks.harness analyse results.jsonl

``run`` executes every permutation of the chosen treatments; ``prep``
materializes datasets under ``benchmarks/data/`` so timed runs never
pay generation; ``manifest`` reports done/missing per permutation
(done = ``benchmarks/results/<id>/record.json`` exists); ``benchmark``
runs exactly one permutation and writes its artifact.
"""

from benchmarks.harness.core import (  # noqa: F401
    Record,
    REGISTRY,
    Treatment,
    _clustered,
    _er_graph,
    emit_for,
)
from benchmarks.harness.registry import (  # noqa: F401
    Permutation,
    all_permutations,
    filter_permutations,
    permutation_status,
)
from benchmarks.harness.cli import main  # noqa: F401
