"""Generate EXECUTED tutorial .ipynb notebooks for each example.

Reference parity bar: the reference's notebooks are narrative,
multi-cell tutorials (``examples/llm_extract/llm_extract.ipynb``: 51
cells). Each example here ships a ``notebook.py`` in the jupytext
percent format (``# %% [markdown]`` / ``# %%`` markers) that this
script parses into cells, executes CELL BY CELL in one shared
namespace (capturing per-cell stdout and final-expression values, like
a kernel), and writes as a committed .ipynb with real outputs — so the
notebooks are step-by-step tutorials AND per-cell API-drift detectors.

Regenerate after editing any example:

    python -m examples.make_notebooks            # execute + write
    python -m examples.make_notebooks --no-exec  # skip execution
"""

import ast
import contextlib
import io
import json
import re
import sys
import traceback
from pathlib import Path

HERE = Path(__file__).parent

_CELL_RE = re.compile(r"^# %%(.*)$", re.M)


def parse_percent_cells(source: str) -> list[tuple[str, str]]:
    """Split jupytext percent-format source into (kind, text) cells.
    ``# %% [markdown]`` cells hold markdown in ``# ``-prefixed lines;
    plain ``# %%`` starts a code cell. Text before the first marker is
    ignored (module docstring / imports live in the first code cell)."""
    cells: list[tuple[str, str]] = []
    matches = list(_CELL_RE.finditer(source))
    for i, m in enumerate(matches):
        start = m.end() + 1
        end = matches[i + 1].start() if i + 1 < len(matches) else len(source)
        body = source[start:end].rstrip("\n")
        if "[markdown]" in m.group(1):
            lines = [
                re.sub(r"^# ?", "", ln) for ln in body.splitlines()
            ]
            cells.append(("markdown", "\n".join(lines).strip()))
        else:
            cells.append(("code", body.strip("\n")))
    return [c for c in cells if c[1].strip()]


def execute_cell(source: str, ns: dict) -> list[dict]:
    """Run one code cell in the shared namespace the way a kernel
    would: execute every statement, display the final expression's
    value. Returns notebook ``outputs``."""
    tree = ast.parse(source)
    last_expr = None
    if tree.body and isinstance(tree.body[-1], ast.Expr):
        last_expr = ast.Expression(tree.body[-1].value)
        tree.body = tree.body[:-1]
    buf = io.StringIO()
    outputs: list[dict] = []
    try:
        with contextlib.redirect_stdout(buf):
            exec(compile(tree, "<cell>", "exec"), ns)
            value = (
                eval(compile(last_expr, "<cell>", "eval"), ns)
                if last_expr is not None
                else None
            )
    except Exception:
        if buf.getvalue():
            outputs.append({"output_type": "stream", "name": "stdout",
                            "text": buf.getvalue().splitlines(keepends=True)})
        outputs.append({
            "output_type": "error",
            "ename": sys.exc_info()[0].__name__,
            "evalue": str(sys.exc_info()[1]),
            "traceback": traceback.format_exc().splitlines(),
        })
        return outputs
    if buf.getvalue():
        outputs.append({"output_type": "stream", "name": "stdout",
                        "text": buf.getvalue().splitlines(keepends=True)})
    if value is not None:
        outputs.append({
            "output_type": "execute_result",
            "execution_count": 1,
            "data": {"text/plain": repr(value).splitlines(keepends=True)},
            "metadata": {},
        })
    return outputs


def execute_source(source: str) -> list[dict]:
    """Back-compat single-cell executor (tests and legacy callers):
    one cell, fresh namespace, clean model registry."""
    from muninn_tpu.models.registry import registry

    _snapshot = dict(registry._models)
    registry._models.clear()
    try:
        return execute_cell(source, {"__name__": "__notebook__"})
    finally:
        registry._models.clear()
        registry._models.update(_snapshot)


def build_notebook(readme: str, source: str, execute: bool = False) -> dict:
    """Build the notebook dict from a percent-format ``notebook.py``
    source (preferred) or a flat script (legacy single-cell form)."""
    cells_src = parse_percent_cells(source)
    if not cells_src:
        # legacy flat script: strip the __main__ guard, one code cell
        body = re.sub(
            r'if __name__ == "__main__":\n((?:    .*\n?|\n)+)',
            lambda m: re.sub(r"^    ", "", m.group(1), flags=re.M),
            source,
        )
        cells_src = [("code", body)]

    ns: dict = {"__name__": "__notebook__"}
    snapshot = None
    if execute:
        from muninn_tpu.models.registry import registry

        snapshot = dict(registry._models)
        registry._models.clear()
    cells = [
        {"cell_type": "markdown", "metadata": {},
         "source": readme.splitlines(keepends=True)},
    ]
    count = 0
    try:
        for kind, text in cells_src:
            if kind == "markdown":
                cells.append({"cell_type": "markdown", "metadata": {},
                              "source": text.splitlines(keepends=True)})
                continue
            count += 1
            outputs = execute_cell(text, ns) if execute else []
            cells.append({
                "cell_type": "code",
                "execution_count": count if execute else None,
                "metadata": {},
                "outputs": outputs,
                "source": text.splitlines(keepends=True),
            })
    finally:
        if snapshot is not None:
            from muninn_tpu.models.registry import registry

            registry._models.clear()
            registry._models.update(snapshot)
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def notebook_source(d: Path) -> Path:
    """The notebook's source file: ``notebook.py`` (percent format)
    when present, else the example script."""
    for name in ("notebook.py", "main.py", "pipeline.py"):
        if (d / name).exists():
            return d / name
    raise FileNotFoundError(d)


def example_dirs() -> list[Path]:
    out = []
    for d in sorted(HERE.iterdir()):
        if not d.is_dir():
            continue
        has_script = (d / "main.py").exists() or (d / "pipeline.py").exists()
        if has_script and (d / "README.md").exists():
            out.append(d)
    return out


def main(execute: bool = True) -> list[Path]:
    written = []
    for d in example_dirs():
        nb = build_notebook(
            (d / "README.md").read_text(),
            notebook_source(d).read_text(), execute,
        )
        if execute:
            for c in nb["cells"]:
                if c["cell_type"] != "code":
                    continue
                bad = [o for o in c["outputs"]
                       if o["output_type"] == "error"]
                if bad:
                    raise RuntimeError(
                        f"{d.name} notebook failed: {bad[0]['ename']}: "
                        f"{bad[0]['evalue']}"
                    )
        out = d / f"{d.name}.ipynb"
        out.write_text(json.dumps(nb, indent=1))
        written.append(out)
    return written


if __name__ == "__main__":
    # examples run hash/echo backends at tiny sizes — force CPU so
    # notebook generation neither grabs the single-client TPU tunnel
    # nor hangs when the tunnel is down (the axon plugin ignores the
    # JAX_PLATFORMS env var; config must be set before first device use)
    import jax

    jax.config.update("jax_platforms", "cpu")
    for p in main(execute="--no-exec" not in sys.argv[1:]):
        print(p)
