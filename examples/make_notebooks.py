"""Generate an .ipynb companion for each example (reference parity:
every example dir ships .py + .ipynb + README). The notebook embeds the
README as a markdown cell and the example source as one runnable cell.

Regenerate after editing any example:

    python -m examples.make_notebooks
"""

import json
from pathlib import Path

HERE = Path(__file__).parent


def build_notebook(readme: str, source: str) -> dict:
    # drop the __main__ guard: notebooks call main() directly
    body = source.replace('if __name__ == "__main__":\n    main()', "main()")
    return {
        "cells": [
            {"cell_type": "markdown", "metadata": {},
             "source": readme.splitlines(keepends=True)},
            {"cell_type": "code", "execution_count": None, "metadata": {},
             "outputs": [], "source": body.splitlines(keepends=True)},
        ],
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main() -> list[Path]:
    written = []
    for d in sorted(HERE.iterdir()):
        if not d.is_dir():
            continue
        script = d / "main.py"
        if not script.exists():
            script = d / "pipeline.py"
        readme = d / "README.md"
        if not (script.exists() and readme.exists()):
            continue
        nb = build_notebook(readme.read_text(), script.read_text())
        out = d / f"{d.name}.ipynb"
        out.write_text(json.dumps(nb, indent=1))
        written.append(out)
    return written


if __name__ == "__main__":
    for p in main():
        print(p)
