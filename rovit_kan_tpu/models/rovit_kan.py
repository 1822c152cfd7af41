"""RoViT-KAN multi-task model assembly.

Capability parity with `/root/reference/models/rovit_kan.py:9-181`, with one
deliberate TPU-first redesign: the forward pass ALWAYS emits every head
output with fixed shapes. The reference returns ``None`` for heads beyond the
current curriculum stage, which under jit would mean four different traced
output signatures; here curriculum gating is a *loss-side* mask
(training/losses.py), so one compiled program serves all four stages and the
output pytree is stable. Ablation variants (heads structurally absent) are a
different module config -> different params/compile, matching the reference's
AblationModel (experiments/ablation.py:30-143).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from rovit_kan_tpu.config import Config
from rovit_kan_tpu.models.vit import VisionTransformer
from rovit_kan_tpu.models.heads import (
    ClassificationHead,
    OrdinalHead,
    UncertaintyHead,
)
from rovit_kan_tpu.models.kan import KANSeverityModule
from rovit_kan_tpu.ops.ordinal import (
    cumulative_to_class_probs,
    ordinal_expected_severity,
)


class RoViTKAN(nn.Module):
    """ViT backbone + 4 task heads.

    Attributes mirror the reference ctor kwargs (models/rovit_kan.py:10-38).
    ``with_*`` toggles realize the ablation variants: a disabled head has no
    params and its output slot is filled with zeros (masked out of the loss
    and marked absent via ``head_mask``).
    """
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    image_size: int = 224
    patch_size: int = 16
    num_classes: int = 4
    hidden_dim: int = 128
    dropout: float = 0.3
    kan_layers: tuple = (192, 64, 16, 1)
    kan_num_knots: int = 5
    kan_degree: int = 3
    with_ordinal: bool = True
    with_uncertainty: bool = True
    with_kan: bool = True
    dtype: Any = jnp.float32          # backbone compute dtype (bf16 for MXU)
    use_pallas_attention: bool = False
    use_pallas_kan: bool = False
    use_pallas_block: bool = False    # whole-block fused kernel
    remat: bool = False
    # Sequence-parallel activation sharding for the backbone residual
    # stream (see models/vit.py::VisionTransformer.act_sharding and
    # parallel/tensor.py::seq_sharding). None = no constraint.
    act_sharding: Any = None
    # Opt-in MoE FFN (models/moe.py): >1 turns every moe_every-th backbone
    # block sparse; shard experts with parallel.tensor.moe_param_specs.
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 2.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_attention: bool = False,
        gradcam_perturbation: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        B = x.shape[0]
        bb = VisionTransformer(
            image_size=self.image_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            dtype=self.dtype, use_pallas=self.use_pallas_attention,
            use_fused_block=self.use_pallas_block,
            remat=self.remat, act_sharding=self.act_sharding,
            moe_experts=self.moe_experts, moe_every=self.moe_every,
            moe_capacity_factor=self.moe_capacity_factor,
            name="backbone",
        )(x, return_attention=return_attention,
          gradcam_perturbation=gradcam_perturbation)
        feats = bb["features"]                        # (B, 192) fp32

        out: Dict[str, jnp.ndarray] = {
            "features": feats,
            "cls_logits": ClassificationHead(
                self.hidden_dim, self.num_classes, self.dropout,
                name="classification_head")(feats, deterministic),
        }

        if self.with_ordinal:
            out["ordinal_logits"] = OrdinalHead(
                self.hidden_dim, self.num_classes, self.dropout,
                name="ordinal_head")(feats, deterministic)
        else:
            out["ordinal_logits"] = jnp.zeros((B, self.num_classes - 1))

        if self.with_uncertainty:
            mu, log_var = UncertaintyHead(
                self.hidden_dim, self.dropout,
                name="uncertainty_head")(feats, deterministic)
        else:
            mu = jnp.zeros((B, 1))
            log_var = jnp.zeros((B, 1))
        out["mu"], out["log_var"] = mu, log_var

        if self.with_kan:
            out["kan_severity"] = KANSeverityModule(
                tuple(self.kan_layers), self.kan_num_knots, self.kan_degree,
                use_pallas=self.use_pallas_kan, name="kan_module")(feats)
        else:
            out["kan_severity"] = jnp.zeros((B, 1))

        if return_attention:
            out["attention"] = bb["attention"]
        if gradcam_perturbation is not None:
            out["norm1_tap"] = bb["norm1_tap"]
        return out

    @property
    def head_mask(self) -> Dict[str, bool]:
        """Static per-head presence flags consumed by the joint loss."""
        return {
            "ordinal": self.with_ordinal,
            "uncertainty": self.with_uncertainty,
            "kan": self.with_kan,
        }


def _resolve_pallas_attention(setting, *, image_size: int, patch_size: int,
                              inference: bool,
                              dtype: Any = jnp.bfloat16) -> bool:
    """Tri-state kernel policy -> concrete bool.

    ``"auto"`` encodes the measured TPU v5e crossover (docs/VALIDATION.md
    "Pallas vs XLA"): the fused Pallas forward only beats XLA for
    *inference* at >=~512 tokens — measured in bf16, so fp32 builds
    (unmeasured, 2x the VMEM per whole-head tile) stay on XLA too; XLA
    wins training at every length tried.
    """
    if setting == "auto":
        n_tokens = (image_size // patch_size) ** 2 + 1
        return (bool(inference) and n_tokens >= 512
                and dtype == jnp.bfloat16
                and jax.default_backend() == "tpu")
    return bool(setting)


def _resolve_pallas_block(setting, *, inference: bool,
                          dtype: Any = jnp.bfloat16,
                          embed_dim: int = 192) -> bool:
    """Whole-block fused kernel policy.

    ``"auto"`` encodes the measured TPU v5e A/Bs
    (outputs/ab_block_sweep*.json, ab_block_train_*.json,
    docs/VALIDATION.md round 3): with both directions fused the block
    kernel wins bf16 on TPU — inference +45% at bs=1 through +81% at
    bs=256 (197 tokens, d=192), +105%/+83% at d=384/768 bs=256, and
    TRAINING +37% at d=192 / +16% at d=384 via the fused Pallas
    backward. TRAINING at d>512 is gated OFF: the backward kernel's
    C=1 stack needs 27 MB scoped VMEM at d=768 vs the 16 MB v5e limit
    (fails compilation inside the scanned-epoch program; measured win
    there was +3% anyway — XLA backward costs nothing). fp32 builds
    (unmeasured, 2x VMEM) stay on XLA. The kernel needs no aux
    outputs; models/vit.py falls back per-call when attention maps or
    the Grad-CAM tap are requested."""
    if setting == "auto":
        return (dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"
                and (bool(inference) or embed_dim <= 512))
    return bool(setting)


def build_model(config: Config, *, with_ordinal: Optional[bool] = None,
                with_uncertainty: Optional[bool] = None,
                with_kan: Optional[bool] = None,
                dtype: Optional[Any] = None,
                inference: bool = False,
                act_sharding: Optional[Any] = None) -> RoViTKAN:
    """Construct RoViTKAN from a Config (reference models/rovit_kan.py:10-38
    accepts a Config the same way). Head toggles default to the config's
    ``model.with_*`` fields (persisted in checkpoints), so ablation-variant
    checkpoints rebuild their exact architecture. ``inference=True`` feeds
    the "auto" attention-kernel policy (forward-only deployments may pick
    the Pallas kernel where it measured faster)."""
    m = config.model
    if with_ordinal is None:
        with_ordinal = getattr(m, "with_ordinal", True)
    if with_uncertainty is None:
        with_uncertainty = getattr(m, "with_uncertainty", True)
    if with_kan is None:
        with_kan = getattr(m, "with_kan", True)
    if dtype is None:
        dtype = jnp.bfloat16 if config.flags.mixed_precision else jnp.float32
    return RoViTKAN(
        embed_dim=m.embed_dim, depth=m.depth, num_heads=m.num_heads,
        mlp_ratio=m.mlp_ratio, image_size=config.data.image_size,
        patch_size=m.patch_size, num_classes=m.num_classes,
        hidden_dim=m.hidden_dim, dropout=m.dropout,
        kan_layers=tuple(m.kan_layers), kan_num_knots=m.kan_num_knots,
        kan_degree=m.kan_degree,
        with_ordinal=with_ordinal, with_uncertainty=with_uncertainty,
        with_kan=with_kan, dtype=dtype,
        use_pallas_attention=_resolve_pallas_attention(
            config.tpu.use_pallas_attention,
            image_size=config.data.image_size, patch_size=m.patch_size,
            inference=inference, dtype=dtype),
        use_pallas_kan=config.tpu.use_pallas_kan,
        use_pallas_block=_resolve_pallas_block(
            getattr(config.tpu, "use_pallas_block", "auto"),
            inference=inference, dtype=dtype, embed_dim=m.embed_dim),
        remat=config.tpu.remat_backbone,
        act_sharding=act_sharding,
        moe_experts=getattr(m, "moe_experts", 0),
        moe_every=getattr(m, "moe_every", 2),
        moe_capacity_factor=getattr(m, "moe_capacity_factor", 2.0),
    )


def predict(model: RoViTKAN, params: Any, x: jnp.ndarray,
            key: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Inference with derived quantities — functional analogue of the
    reference's ``RoViTKAN.predict`` (models/rovit_kan.py:126-161)."""
    out = model.apply({"params": params}, x, deterministic=True)
    out["cls_probs"] = jax.nn.softmax(out["cls_logits"], axis=-1)
    out["cls_pred"] = jnp.argmax(out["cls_logits"], axis=-1)
    if model.with_ordinal:
        out["ordinal_probs"] = cumulative_to_class_probs(out["ordinal_logits"])
        out["ordinal_severity"] = ordinal_expected_severity(out["ordinal_logits"])
    if model.with_uncertainty:
        out["uncertainty_std"] = jnp.exp(0.5 * out["log_var"])
    return out


def count_parameters(params: Any) -> Dict[str, int]:
    """Per-component parameter counts (reference models/rovit_kan.py:172-181).

    Ground truth for the full model: 5,706,394 total
    (reference outputs/ablation/full_model/test_metrics.json)."""
    def count(tree):
        return sum(int(x.size) for x in jax.tree.leaves(tree))

    by_comp = {name: count(sub) for name, sub in params.items()}
    by_comp["total"] = count(params)
    return by_comp
