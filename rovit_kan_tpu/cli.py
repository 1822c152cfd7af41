"""Console-script entry points (pyproject [project.scripts]) — thin
wrappers over the scripts/ drivers so an installed package exposes the same
CLI surface as a source checkout."""
from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def _run(script: str):
    path = _SCRIPTS / script
    if path.exists():
        spec = importlib.util.spec_from_file_location(script[:-3], path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.main()
    sys.exit(f"script {script} not found (install from a source checkout "
             f"or run scripts/{script} directly)")


def train_main():
    return _run("train.py")


def evaluate_main():
    return _run("evaluate.py")


def visualize_main():
    return _run("visualize.py")


def ablation_main():
    return _run("run_ablation.py")


def baselines_main():
    return _run("run_baselines.py")


def convert_main():
    return _run("convert_checkpoint.py")


def serve_main():
    return _run("serve.py")


def export_main():
    return _run("export_model.py")
