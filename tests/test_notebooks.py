"""Notebook parity (reference notebooks/*.ipynb): every code cell executes
headless end-to-end in CI-lite mode (MEDVAE_NB_QUICK), widget cells degrade
gracefully without a live frontend."""

import os

import nbformat
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOKS = [
    "vanilla_vae_interactive.ipynb",
    "conditional_disentangled_vae_interactive.ipynb",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_runs_headless(name, tmp_path, monkeypatch):
    monkeypatch.setenv("MEDVAE_NB_QUICK", "1")
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.chdir(tmp_path)  # notebooks resolve the repo via sys.path
    nb = nbformat.read(os.path.join(_ROOT, "notebooks", name), as_version=4)
    ns = {"__name__": "__nbtest__"}
    code_cells = [c for c in nb.cells if c.cell_type == "code"]
    assert len(code_cells) >= 6
    # notebooks add repo-relative paths; make the repo importable from tmp
    import sys

    sys.path.insert(0, _ROOT)
    try:
        for i, cell in enumerate(code_cells):
            try:
                exec(compile(cell.source, f"{name}:cell{i}", "exec"), ns)
            except Exception as e:
                raise AssertionError(
                    f"{name} cell {i} failed: {type(e).__name__}: {e}\n"
                    f"--- cell source ---\n{cell.source}"
                ) from e
    finally:
        sys.path.remove(_ROOT)
