"""Execute the narrated workload docs (docs/notebooks/*.md) end to end.

Mirrors the reference CI's notebook-execution check
(.github/workflows/test_and_build.yml:434): every python code fence in
each document runs in order in a shared namespace; the embedded asserts
are the acceptance criteria (SURVEY §6 acceptance workloads).
"""

import pathlib
import re

import pytest

DOCS = sorted(
    (pathlib.Path(__file__).parent.parent / "docs" / "notebooks").glob("*.md")
)

_FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


@pytest.mark.parametrize("path", DOCS, ids=[p.stem for p in DOCS])
def test_notebook_doc_executes(path):
    blocks = _FENCE.findall(path.read_text())
    assert blocks, f"{path.name} has no python code fences"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{path.name}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - debugging aid
            raise AssertionError(
                f"{path.name} block {i} failed: {e}\n---\n{block}") from e


def test_docs_cover_all_acceptance_workloads():
    names = {p.stem.split("_", 1)[1] for p in DOCS}
    assert {"bfs_levels", "sssp", "pagerank", "connected_components",
            "triangle_count"} <= names
