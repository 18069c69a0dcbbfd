"""Execute the example notebooks top-to-bottom in CI-lite mode
(STYLETTS2_DEMO_LITE=1 shrinks widths): every code cell must run — the
walkthroughs mirror the reference Demo/Colab notebooks and rot silently
otherwise (VERDICT round-2 #10)."""

import json
import os

import pytest

NB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "examples")


def run_notebook(name, tmp_path, monkeypatch):
    monkeypatch.setenv("STYLETTS2_DEMO_LITE", "1")
    monkeypatch.chdir(tmp_path)
    with open(os.path.join(NB_DIR, name)) as f:
        nb = json.load(f)
    ns = {}
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        src = "\n".join(  # notebook-style shell escapes are comments here
            l for l in src.splitlines() if not l.strip().startswith("!")
        )
        try:
            exec(compile(src, f"{name}:cell{i}", "exec"), ns)
        except Exception as e:
            pytest.fail(f"{name} cell {i} failed: {type(e).__name__}: {e}")


@pytest.mark.slow
def test_demo_ljspeech_notebook(tmp_path, monkeypatch):
    run_notebook("demo_ljspeech.ipynb", tmp_path, monkeypatch)


@pytest.mark.slow
def test_demo_libritts_notebook(tmp_path, monkeypatch):
    run_notebook("demo_libritts.ipynb", tmp_path, monkeypatch)


@pytest.mark.slow
def test_finetune_notebook(tmp_path, monkeypatch):
    run_notebook("finetune_demo.ipynb", tmp_path, monkeypatch)
