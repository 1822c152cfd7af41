"""Config tree for the TPU framework.

Capability parity with the reference's nested dataclass config
(`/root/reference/configs/config.py:1-122`): same defaults (4 classes,
severity map, 224px, bs=32, 50 epochs, lr=1e-4, curriculum stage boundaries
10/25/40/50, KAN [192,64,16,1] with 5 knots / degree 3, dropout 0.3), plus
TPU-specific knobs (mesh shape, bf16 policy, Pallas kernel toggles) that have
no reference analogue.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional


@dataclass
class DataConfig:
    dataset_root: Path = Path("data")
    augmented_root: Path = Path("data/Augmented Image")
    original_root: Path = Path("data/Original Image")

    class_names: List[str] = field(default_factory=lambda: [
        "Healthy Leaf",
        "Leaf Holes",
        "Black Spot",
        "Dry Leaf",
    ])

    severity_map: Dict[str, int] = field(default_factory=lambda: {
        "Healthy Leaf": 0,
        "Leaf Holes": 1,
        "Black Spot": 2,
        "Dry Leaf": 3,
    })

    num_classes: int = 4
    image_size: int = 224
    train_val_split: float = 0.8
    # Host-side prefetch depth (the TPU analogue of DataLoader workers).
    prefetch_batches: int = 2
    num_workers: int = 4


@dataclass
class TrainConfig:
    batch_size: int = 32
    epochs: int = 50
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    early_stop_patience: int = 10
    # Gradient accumulation: effective batch = batch_size * accum_steps
    # (optax.MultiSteps; params update every accum_steps micro-batches).
    accum_steps: int = 1
    # Exponential moving average of params for evaluation/serving
    # (ema = d*ema + (1-d)*params after each step). 0 disables (reference
    # parity — the reference has no EMA). When on, validation, the best
    # checkpoint, and downstream evaluation all use the EMA weights.
    ema_decay: float = 0.0
    use_curriculum: bool = True
    # Minimum seconds between best-model DISK writes. 0 (the default,
    # reference parity) checkpoints every val improvement; with a steadily
    # improving val loss and a large model that serializes a full
    # state-tree fetch every epoch (measured: the 86.5M-param base preset
    # spent ~100 s/epoch writing 1.2 GB through this sandbox's TPU relay
    # vs ~6 s of device compute). The cooldown only throttles the disk
    # write — best-model selection still updates in memory every
    # improvement, and the pending best is flushed on completion, early
    # stop, and preemption, so no result changes.
    checkpoint_min_interval_s: float = 0.0
    seeds: List[int] = field(default_factory=lambda: [42, 123, 999])
    stage_1_epochs: int = 10
    stage_2_epochs: int = 25
    stage_3_epochs: int = 40
    stage_4_epochs: int = 50


@dataclass
class LossConfig:
    lambda_ord: float = 1.0
    mu_unc: float = 0.5
    nu_kan: float = 0.5
    focal_gamma: float = 2.0
    # Per-class focal alpha; populated at runtime from dataset class weights.
    focal_alpha: Optional[List[float]] = None


@dataclass
class ModelConfig:
    backbone: str = "deit_tiny_patch16_224"
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    patch_size: int = 16
    pretrained: bool = True
    freeze_backbone: bool = False
    num_classes: int = 4
    # Structural head toggles (ablation variants); persisted into
    # checkpoints so evaluate/serving rebuild the exact architecture.
    with_ordinal: bool = True
    with_uncertainty: bool = True
    with_kan: bool = True
    kan_layers: List[int] = field(default_factory=lambda: [192, 64, 16, 1])
    kan_num_knots: int = 5
    kan_degree: int = 3
    dropout: float = 0.3
    hidden_dim: int = 128
    # Path to converted pretrained weights (a .npz produced by
    # models/convert.py). None -> random init (pretrained flag is then moot,
    # since this environment has no network egress to fetch timm weights).
    pretrained_npz: Optional[Path] = None
    # Opt-in Mixture-of-Experts FFN (models/moe.py, expert-choice routing):
    # moe_experts > 1 turns every moe_every-th backbone block sparse. The
    # flagship is dense (0); these exist for the expert-parallel deployment
    # story (parallel/tensor.py::make_moe_mesh / moe_param_specs).
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 2.0


@dataclass
class PathConfig:
    checkpoints_dir: Path = Path("checkpoints")
    results_dir: Path = Path("results")
    figures_dir: Path = Path("results/figures")
    logs_dir: Path = Path("results/logs")

    def ensure_dirs(self) -> None:
        for p in (self.checkpoints_dir, self.results_dir,
                  self.figures_dir, self.logs_dir):
            Path(p).mkdir(parents=True, exist_ok=True)


@dataclass
class FlagsConfig:
    use_mixup: bool = True
    use_cutmix: bool = True
    mixup_alpha: float = 0.2
    cutmix_alpha: float = 1.0
    mixed_precision: bool = True      # bf16 compute in the backbone
    curriculum: bool = True
    freeze_backbone_epochs: int = 5
    gradient_clip: float = 1.0


@dataclass
class TPUConfig:
    """TPU-specific execution knobs (no reference analogue)."""
    # Data-parallel axis size; -1 = all visible devices.
    data_parallel: int = -1
    mesh_axis_name: str = "data"
    # Attention kernel policy, from the measured TPU v5e crossover
    # (scripts/bench_kernels.py A/B, docs/VALIDATION.md "Pallas vs XLA"):
    # XLA wins training at every sequence length tried (fused-backward
    # Pallas: 576 vs 906 img/s at 577 tokens) and inference at 197 tokens,
    # while the fused Pallas forward wins inference at >=~512 tokens
    # (3,500 vs 2,946 img/s at 577). "auto" (default) applies exactly that
    # table: Pallas iff building for inference AND the token count is >=512
    # AND the backend is TPU. True/False force one implementation.
    use_pallas_attention: "bool | str" = "auto"
    use_pallas_kan: bool = False
    # Whole-transformer-block fused kernel (ops/block_kernel.py): one
    # kernel launch per block, all intermediates VMEM-resident. "auto"
    # applies the measured policy (see models/rovit_kan.py).
    use_pallas_block: "bool | str" = "auto"
    # Single-flat-vector AdamW update (training/optimizer.py::_flat_adamw):
    # identical math to the per-leaf optax chain, hundreds fewer kernel
    # launches (the chain measured 4.7-5.0 ms/step on v5e — batch-
    # independent). Auto-disabled under tensor parallelism, where moments
    # must shard per-parameter.
    fused_optimizer: bool = True
    # Whole-augmentation-chain fused kernel (ops/augment_kernel.py): one
    # uint8 read -> one normalized write per batch, flips/grayscale as
    # constant-matrix MXU matmuls. "auto" = on TPU when the backbone runs
    # bf16 (the kernel computes in bf16; the XLA f32 chain stays the
    # default for exact-parity f32 training). True/False force it.
    fused_augment: "bool | str" = "auto"
    donate_state: bool = True
    # Rematerialize backbone blocks on backward (activation memory ~ O(1)
    # in depth instead of O(depth); enables very large batches).
    remat_backbone: bool = False
    # Pipeline parallelism (parallel/pipeline.py): stages over a "pipe"
    # mesh axis (scripts/train.py --pipeline_parallel S builds the mesh;
    # any Trainer given a mesh with a "pipe" axis pipelines). Microbatches
    # per local batch — bubble fraction is (S-1)/(n_micro+S-1).
    pipeline_microbatches: int = 4


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    paths: PathConfig = field(default_factory=PathConfig)
    flags: FlagsConfig = field(default_factory=FlagsConfig)
    tpu: TPUConfig = field(default_factory=TPUConfig)

    def get_stage_for_epoch(self, epoch: int) -> int:
        """Curriculum stage for a 1-indexed epoch.

        Mirrors reference `configs/config.py:108-118`: stage 4 always when the
        curriculum flag is off, otherwise 1/2/3/4 split at the stage-epoch
        boundaries.
        """
        if not self.flags.curriculum:
            return 4
        if epoch <= self.train.stage_1_epochs:
            return 1
        if epoch <= self.train.stage_2_epochs:
            return 2
        if epoch <= self.train.stage_3_epochs:
            return 3
        return 4

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        """JSON-safe nested dict (paths stringified) — serialized into
        checkpoints like the reference pickles its config object
        (reference training/trainer.py:319)."""
        def conv(x):
            if dataclasses.is_dataclass(x):
                return {f.name: conv(getattr(x, f.name))
                        for f in dataclasses.fields(x)}
            if isinstance(x, Path):
                return str(x)
            if isinstance(x, dict):
                return {k: conv(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return [conv(v) for v in x]
            return x
        return conv(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        cfg = cls()
        for section_name, section in d.items():
            obj = getattr(cfg, section_name, None)
            if obj is None or not isinstance(section, dict):
                continue
            for k, v in section.items():
                if not hasattr(obj, k):
                    continue
                cur = getattr(obj, k)
                if isinstance(cur, Path):
                    v = Path(v)
                setattr(obj, k, v)
        return cfg


#: Backbone width presets. "tiny" is the reference's DeiT-Tiny flagship
#: (`/root/reference/models/backbone.py:12-18`); "small"/"base" are the
#: standard DeiT widths this framework is additionally validated at — the
#: fused block kernel wins at every preset (docs/VALIDATION.md "Scale
#: generalization": inference +105% at d=384/bs256, +83% at d=768/bs256;
#: training +16% at d=384) and the dp/tp/pp mesh recipes apply unchanged.
#: Both larger presets train end-to-end on one v5e: "small" converged in
#: round 3 (outputs/preset_small_4k) and "base" (86.5M params) in round 5
#: — early stop at epoch 115, test acc 0.9990 on the 4k-image recipe at
#: 6 s/epoch (outputs/preset_base_4k; docs/VALIDATION.md round 5).
_PRESETS = {
    "tiny": dict(embed_dim=192, num_heads=3),
    "small": dict(embed_dim=384, num_heads=6),
    "base": dict(embed_dim=768, num_heads=12),
}


def get_config(preset: str = "tiny") -> Config:
    """Default config, optionally at a scaled backbone preset
    ("tiny" | "small" | "base"). The KAN tree's input width follows the
    embed dim; everything else (depth 12, patch 16, heads' hidden dims,
    training recipe) is preset-independent."""
    cfg = Config()
    if preset != "tiny":
        p = _PRESETS[preset]
        cfg.model.embed_dim = p["embed_dim"]
        cfg.model.num_heads = p["num_heads"]
        cfg.model.kan_layers = [p["embed_dim"]] + cfg.model.kan_layers[1:]
    return cfg
