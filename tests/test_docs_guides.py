"""Every ```python block in docs/guides/*.md must RUN.

The reference ships ~4k lines of task-oriented guides
(/root/reference/docs/*.md); ours execute — each guide's snippets run
top-to-bottom in one shared namespace per file, so the guides are
integration tests of the exact code a reader will paste (the same
drift-detection contract the benchmark pages have in test_docs.py).
"""

import pathlib
import re

import pytest

GUIDES = sorted(
    (pathlib.Path(__file__).resolve().parents[1] / "docs" / "guides").glob(
        "*.md"
    )
)
assert GUIDES, "docs/guides is empty"

FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(path):
    return FENCE.findall(path.read_text())


def test_every_guide_has_runnable_snippets():
    for g in GUIDES:
        if g.name == "index.md":
            continue
        assert _blocks(g), f"{g.name} has no python snippets"


@pytest.mark.parametrize("guide", GUIDES, ids=lambda p: p.name)
def test_guide_snippets_execute(guide):
    ns: dict = {"__name__": f"docs_guide_{guide.stem}"}
    for i, block in enumerate(_blocks(guide)):
        try:
            exec(compile(block, f"{guide.name}[block {i}]", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"{guide.name} block {i} failed: {e!r}\n---\n{block}"
            ) from e
