"""Generate an EXECUTED .ipynb companion for each example (reference
parity: every example dir ships .py + .ipynb + README). The notebook
embeds the README as a markdown cell and the example source as one
runnable cell, executed at generation time so the committed notebooks
carry real outputs and break when APIs drift.

Regenerate after editing any example:

    python -m examples.make_notebooks            # execute + write
    python -m examples.make_notebooks --no-exec  # skip execution
"""

import ast
import contextlib
import io
import json
import sys
import traceback
from pathlib import Path

HERE = Path(__file__).parent


def execute_source(source: str) -> list[dict]:
    """Run a code cell the way a notebook kernel would: execute every
    statement, display the final expression's value. Returns notebook
    ``outputs`` (stream + execute_result / error). No jupyter runtime
    needed — examples are plain library calls on the hash/echo
    backends at tiny sizes."""
    tree = ast.parse(source)
    last_expr = None
    if tree.body and isinstance(tree.body[-1], ast.Expr):
        last_expr = ast.Expression(tree.body[-1].value)
        tree.body = tree.body[:-1]
    # each notebook runs against a clean model registry (examples
    # register models under overlapping names; a real notebook gets a
    # fresh kernel)
    from muninn_tpu.models.registry import registry

    _snapshot = dict(registry._models)
    registry._models.clear()
    ns: dict = {"__name__": "__notebook__"}
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
    finally:
        registry._models.clear()
        registry._models.update(_snapshot)
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


import re


def build_notebook(readme: str, source: str, execute: bool = False) -> dict:
    # drop the __main__ guard: notebooks run its body at top level
    body = re.sub(
        r'if __name__ == "__main__":\n((?:    .*\n?|\n)+)',
        lambda m: re.sub(r"^    ", "", m.group(1), flags=re.M),
        source,
    )
    outputs = execute_source(body) if execute else []
    return {
        "cells": [
            {"cell_type": "markdown", "metadata": {},
             "source": readme.splitlines(keepends=True)},
            {"cell_type": "code",
             "execution_count": 1 if execute else None, "metadata": {},
             "outputs": outputs, "source": body.splitlines(keepends=True)},
        ],
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def example_dirs() -> list[Path]:
    out = []
    for d in sorted(HERE.iterdir()):
        if not d.is_dir():
            continue
        script = d / "main.py"
        if not script.exists():
            script = d / "pipeline.py"
        if script.exists() and (d / "README.md").exists():
            out.append(d)
    return out


def main(execute: bool = True) -> list[Path]:
    written = []
    for d in example_dirs():
        script = d / "main.py"
        if not script.exists():
            script = d / "pipeline.py"
        nb = build_notebook(
            (d / "README.md").read_text(), script.read_text(), execute
        )
        if execute:
            code = nb["cells"][1]
            bad = [o for o in code["outputs"] if o["output_type"] == "error"]
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
