"""rovit_kan_tpu — TPU-native (JAX/XLA/Pallas) framework for interpretable
rose-disease severity estimation.

A from-scratch rebuild of the capabilities of
`nishitbohra/RoViT-KAN-Interpretable-Vision-Transformer-for-Rose-Disease-Severity-Estimation`
designed TPU-first:

- functional flax models over pytree params (no hooks, no mutable module state)
- a single jit-compiled multi-task forward emitting ALL head outputs with fixed
  shapes (curriculum gating is a loss-side mask, not output-shape instability)
- Pallas kernels for the hot ops (fused ViT attention, fused KAN spline layer)
- data-parallel scaling via jax.sharding.Mesh + NamedSharding over ICI
- bf16 mixed precision on the MXU, fp32 master params and loss

Package layout:
    config.py        nested-dataclass config tree (reference: configs/config.py)
    models/          DeiT-Tiny ViT backbone, task heads, KAN module, assembly
    ops/             core numerics: B-spline basis, ordinal math, mixing,
                     preprocessing, Pallas kernels
    training/        losses, optimizer, jit train step, Trainer
    data/            folder dataset, synthetic fixture, host input pipeline
    evaluation/      metrics + Evaluator
    explainability/  attention rollout, Grad-CAM++, KAN spline viz
    experiments/     ablation + baseline harnesses
    parallel/        mesh/sharding utilities
    results/         experiment logger (CSV/JSON/plots)
"""

__version__ = "0.1.0"

from rovit_kan_tpu.config import Config, get_config  # noqa: F401


def __getattr__(name):
    """Lazy top-level conveniences (keep `import rovit_kan_tpu` light)."""
    import importlib
    lazy = {
        "build_model": ("rovit_kan_tpu.models.rovit_kan", "build_model"),
        "RoViTKAN": ("rovit_kan_tpu.models.rovit_kan", "RoViTKAN"),
        "predict": ("rovit_kan_tpu.models.rovit_kan", "predict"),
        "Trainer": ("rovit_kan_tpu.training.trainer", "Trainer"),
        "Evaluator": ("rovit_kan_tpu.evaluation.evaluator", "Evaluator"),
        "InferenceEngine": ("rovit_kan_tpu.serving", "InferenceEngine"),
        "load_engine": ("rovit_kan_tpu.serving", "load_engine"),
        "MicroBatcher": ("rovit_kan_tpu.serving", "MicroBatcher"),
        "export_serving": ("rovit_kan_tpu.export", "export_serving"),
        "save_exported": ("rovit_kan_tpu.export", "save_exported"),
        "load_exported": ("rovit_kan_tpu.export", "load_exported"),
        "create_dataloaders": ("rovit_kan_tpu.data.dataset",
                               "create_dataloaders"),
        "make_mesh": ("rovit_kan_tpu.parallel.mesh", "make_mesh"),
    }
    if name in lazy:
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'rovit_kan_tpu' has no attribute {name!r}")
