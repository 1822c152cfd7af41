"""DeiT-Tiny / ViT backbone, implemented natively in JAX (flax.linen).

The reference delegates its backbone to `timm.create_model('deit_tiny_patch16_224')`
(`/root/reference/models/backbone.py:12-18`), i.e. the NON-distilled ViT-Tiny:
16x16 patch embed on 224x224 -> 196 patches + 1 CLS token = 197 tokens,
embed dim 192, 12 pre-LN transformer blocks with 3 attention heads and
MLP ratio 4, LayerNorm eps 1e-6, exact (erf) GELU, CLS-token pooling.
Backbone parameter count: 5,524,416 (so the full RoViT-KAN hits the
reference's 5,706,394 — outputs/ablation/full_model/test_metrics.json).

TPU-first design choices:
- Patch embedding is a reshape + one big matmul ``(B*196, 768) @ (768, 192)``
  instead of a conv — identical math, maps directly onto the MXU.
- Attention runs through a fused Pallas kernel by default
  (`ops/attention.py`); set ``use_pallas=False`` (or request attention
  weights) to use the pure-XLA einsum path. Both paths are numerically
  validated against each other in tests.
- bf16 mixed precision via ``dtype=jnp.bfloat16`` with fp32 params and fp32
  LayerNorm/softmax accumulation.
- No hook mechanism exists (or is needed): per-layer attention maps and the
  last block's norm1 activation (the Grad-CAM++ tap, reference
  explainability/gradcam.py:18-43) are *returned* when requested, and the
  tap accepts an additive perturbation input so ``jax.grad`` w.r.t. the
  intermediate is just a grad w.r.t. that input at zero.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from rovit_kan_tpu.ops.attention import fused_attention


class PatchEmbed(nn.Module):
    """16x16 non-overlapping patch embedding as a single MXU matmul.

    Patch pixels are flattened in (row, col, channel) order, so a timm conv
    kernel ``(out, C, kh, kw)`` converts via ``transpose(2, 3, 1, 0)`` then
    reshape to ``(kh*kw*C, out)`` (see models/convert.py).
    """
    patch_size: int = 16
    embed_dim: int = 192
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        x = x.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)            # (B, gh, gw, p, p, C)
        x = x.reshape(B, gh * gw, p * p * C)         # (B, 196, 768)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with optional fused Pallas path."""
    dim: int = 192
    num_heads: int = 3
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_weights: bool = False,
                 n_valid: Optional[int] = None):
        B, N, D = x.shape
        h = self.num_heads
        hd = D // h
        qkv = nn.Dense(3 * D, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]             # (B, h, N, hd)
        scale = hd ** -0.5

        if self.use_pallas and not return_weights and n_valid is None:
            out = fused_attention(q * scale, k, v)   # (B, h, N, hd)
            attn_weights = None
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                                preferred_element_type=jnp.float32)
            if n_valid is not None and n_valid < N:
                # Sequence-parallel padding: tokens >= n_valid are layout
                # filler — mask them out of every softmax so real-token
                # outputs are bit-for-bit independent of the pad.
                kmask = jnp.arange(N) < n_valid
                logits = jnp.where(kmask[None, None, None, :], logits,
                                   jnp.asarray(-1e9, logits.dtype))
            attn_weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd",
                             attn_weights.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)

        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, N, D)
        out = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        if return_weights:
            return out, attn_weights
        return out, None


class Mlp(nn.Module):
    dim: int = 192
    hidden: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)            # timm uses exact GELU
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(x)
        return x


class _LNParams(nn.Module):
    """Declares LayerNorm params (same names/inits as nn.LayerNorm) without
    computing — lets the fused whole-block kernel own the math while the
    param tree stays checkpoint-identical to the unfused Block."""
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones,
                           (self.dim,), jnp.float32),
                self.param("bias", nn.initializers.zeros,
                           (self.dim,), jnp.float32))


class _DenseParams(nn.Module):
    """Param-only twin of nn.Dense (kernel lecun_normal, bias zeros)."""
    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.din, self.dout), jnp.float32),
                self.param("bias", nn.initializers.zeros,
                           (self.dout,), jnp.float32))


class _AttnParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.dim, 3 * self.dim, name="qkv")(),
                _DenseParams(self.dim, self.dim, name="proj")())


class _MlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.dim, self.hidden, name="fc1")(),
                _DenseParams(self.hidden, self.dim, name="fc2")())


class Block(nn.Module):
    """Pre-LN transformer block: x += MHA(LN(x)); x += MLP(LN(x)).

    ``use_fused_block`` routes the whole block through ONE Pallas kernel
    (ops/block_kernel.py) — every intermediate VMEM-resident — whenever no
    aux output (attention weights / Grad-CAM tap) is requested. The param
    tree is identical either way (the _*Params declarers mirror the
    submodule paths), so the flag is a pure runtime choice per checkpoint.
    """
    dim: int = 192
    num_heads: int = 3
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    use_pallas: bool = False
    use_fused_block: bool = False
    # >1 replaces the dense MLP with an expert-choice MoE FFN
    # (models/moe.py) — opt-in, for the expert-parallel deployment story.
    num_experts: int = 0
    moe_capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x, return_weights: bool = False,
                 norm1_perturbation: Optional[jnp.ndarray] = None,
                 n_valid: Optional[int] = None):
        if self.use_fused_block and not return_weights \
                and norm1_perturbation is None and n_valid is None \
                and self.num_experts <= 1:
            from rovit_kan_tpu.ops.block_kernel import fused_vit_block
            ln1s, ln1b = _LNParams(self.dim, name="norm1")()
            (wqkv, bqkv), (wproj, bproj) = _AttnParams(
                self.dim, name="attn")()
            ln2s, ln2b = _LNParams(self.dim, name="norm2")()
            (w1, b1), (w2, b2) = _MlpParams(
                self.dim, int(self.dim * self.mlp_ratio), name="mlp")()
            p = {"ln1_scale": ln1s, "ln1_bias": ln1b,
                 "wqkv": wqkv, "bqkv": bqkv,
                 "wproj": wproj, "bproj": bproj,
                 "ln2_scale": ln2s, "ln2_bias": ln2b,
                 "w1": w1, "b1": b1, "w2": w2, "b2": b2}
            out = fused_vit_block(x.astype(self.dtype), p, self.num_heads)
            return out, None, None
        # LayerNorm always accumulates in fp32 (param_dtype fp32, out fp32
        # then cast) for bf16 stability.
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm1")(x)
        if norm1_perturbation is not None:
            # Additive zero input: grad w.r.t. this equals grad w.r.t. the
            # norm1 activation (Grad-CAM++ tap, no hooks needed).
            y = y + norm1_perturbation
        norm1_out = y
        y = y.astype(self.dtype)
        attn_out, attn_w = Attention(self.dim, self.num_heads,
                                     dtype=self.dtype,
                                     use_pallas=self.use_pallas,
                                     name="attn")(y, return_weights, n_valid)
        x = x + attn_out
        z = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm2")(x)
        if self.num_experts > 1:
            from rovit_kan_tpu.models.moe import MoEMlp
            # Pass the fp32 norm2 output: routing must see full-precision
            # scores (a bf16 round-trip here could flip near-tie expert
            # choices); MoEMlp casts to self.dtype for the FFN math only.
            x = x + MoEMlp(self.dim, int(self.dim * self.mlp_ratio),
                           num_experts=self.num_experts,
                           capacity_factor=self.moe_capacity_factor,
                           dtype=self.dtype,
                           name="moe")(z, n_valid)
        else:
            x = x + Mlp(self.dim, int(self.dim * self.mlp_ratio),
                        dtype=self.dtype, name="mlp")(z.astype(self.dtype))
        return x, attn_w, norm1_out


class VisionTransformer(nn.Module):
    """ViT-Tiny trunk returning the CLS feature (and optional aux taps)."""
    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    use_pallas: bool = False
    use_fused_block: bool = False
    # Rematerialize each block on the backward pass (jax.checkpoint):
    # activations are recomputed instead of stored, trading ~1 extra forward
    # of FLOPs for O(depth) less activation HBM — enables very large batch
    # training. Off by default (the 5.7M model never needs it at bs<=1024).
    remat: bool = False
    # Sequence parallelism (Megatron-style, via GSPMD): a NamedSharding for
    # the (B, N, D) residual stream — typically P("data", "model", None)
    # (batch over dp, tokens over tp; None would mean REPLICATED) from
    # parallel.tensor.seq_sharding — applied at every block boundary. XLA's
    # sharding propagation then keeps LayerNorms/residual adds token-sharded
    # over the tensor-parallel axis and replaces the two TP all-reduces per
    # block with reduce-scatter + all-gather pairs (same bytes on ICI, but
    # the LN/elementwise work and the residual-stream activations shard
    # S-ways instead of being replicated). A token count that does not
    # divide the axis (197 is prime) is zero-padded with attention-masked
    # filler tokens — real-token math is exact. Forces the pure-XLA
    # block path: a Pallas kernel cannot be partitioned over "model".
    act_sharding: Any = None
    # Mixture-of-Experts (opt-in, models/moe.py): with moe_experts > 1,
    # every ``moe_every``-th block replaces its dense MLP with an
    # expert-choice MoE FFN (blocks moe_every-1, 2*moe_every-1, ...).
    # Shard the stacked expert params over an "expert" mesh axis with
    # parallel.tensor.moe_param_specs for expert parallelism.
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 2.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        return_attention: bool = False,
        gradcam_perturbation: Optional[jnp.ndarray] = None,
        return_tokens: bool = False,
    ):
        """Args:
            x: ``(B, H, W, 3)`` normalized images (NHWC — TPU-native layout).
            return_attention: also return per-layer softmax attention
                ``(depth, B, heads, N, N)`` (forces the non-Pallas path).
            gradcam_perturbation: optional ``(B, N, D)`` array added to the
                LAST block's norm1 output (pass zeros; differentiate w.r.t.
                it for Grad-CAM++).
            return_tokens: also return the final pre-pool token sequence.

        Returns:
            dict with ``features`` (B, D) CLS embedding and optional
            ``attention`` / ``norm1_tap`` / ``tokens``.
        """
        B = x.shape[0]
        n_patches = (self.image_size // self.patch_size) ** 2
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       name="patch_embed")(x)
        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, n_patches + 1, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embed.astype(x.dtype)
        n_valid = None

        def _constrain(t):
            # Layout hint only — skip outside a trace: eager
            # with_sharding_constraint is a device_put onto the global mesh,
            # which fails during model.init on a multi-host mesh whose
            # devices are mostly non-addressable (and buys nothing eagerly).
            if isinstance(t, jax.core.Tracer):
                return jax.lax.with_sharding_constraint(t, self.act_sharding)
            return t

        if self.act_sharding is not None:
            # Sharding constraints require the token dim to DIVIDE the mesh
            # axis (GSPMD does not pad annotations; 197 tokens is prime), so
            # pad the stream with filler tokens and mask them out of every
            # attention softmax — real-token math is exact, and the filler
            # rows are sliced off below before the heads ever see them.
            spec_ax = self.act_sharding.spec[1]
            names = ((spec_ax,) if isinstance(spec_ax, str)
                     else tuple(spec_ax or ()))
            sp = 1
            for a in names:
                sp *= self.act_sharding.mesh.shape[a]
            pad = (-x.shape[1]) % sp
            if pad:
                n_valid = x.shape[1]
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                if gradcam_perturbation is not None:
                    gradcam_perturbation = jnp.pad(
                        gradcam_perturbation, ((0, 0), (0, pad), (0, 0)))
            x = _constrain(x)

        attn_maps = []
        norm1_tap = None
        # Remat only applies on the plain training path (aux outputs would
        # be recomputed anyway and lax.cond-free static flags keep it simple).
        block_cls = Block
        if self.remat and not return_attention \
                and gradcam_perturbation is None:
            # static_argnums counts self as 0: 2 = return_weights (a Python
            # bool), 4 = n_valid (a Python int or None).
            block_cls = nn.remat(Block, static_argnums=(2, 4))
        if self.moe_experts > 1 and self.moe_every < 1:
            raise ValueError(
                f"moe_every must be >= 1 with moe_experts > 1 "
                f"(got moe_every={self.moe_every})")
        for i in range(self.depth):
            perturb = gradcam_perturbation if i == self.depth - 1 else None
            moe_here = (self.moe_experts > 1
                        and (i + 1) % self.moe_every == 0)
            x, attn_w, norm1_out = block_cls(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                dtype=self.dtype,
                use_pallas=(self.use_pallas and not return_attention
                            and self.act_sharding is None),
                use_fused_block=(self.use_fused_block
                                 and not return_attention
                                 and self.act_sharding is None),
                num_experts=self.moe_experts if moe_here else 0,
                moe_capacity_factor=self.moe_capacity_factor,
                name=f"blocks_{i}",
            )(x, return_attention, perturb, n_valid)
            if self.act_sharding is not None:
                x = _constrain(x)
            if return_attention:
                attn_maps.append(attn_w)
            if i == self.depth - 1:
                norm1_tap = norm1_out

        if n_valid is not None:
            # Drop the sequence-parallel filler tokens (their attention
            # columns were masked, so real rows never depended on them).
            x = x[:, :n_valid]
            if norm1_tap is not None:
                norm1_tap = norm1_tap[:, :n_valid]
            if return_attention:
                attn_maps = [a[:, :, :n_valid, :n_valid] for a in attn_maps]
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm")(x)
        out: Dict[str, jnp.ndarray] = {"features": x[:, 0].astype(jnp.float32)}
        if return_tokens:
            out["tokens"] = x
        if return_attention:
            out["attention"] = jnp.stack(attn_maps, axis=0)
        out["norm1_tap"] = norm1_tap
        return out


class DeiTTinyBackbone(VisionTransformer):
    """Named alias mirroring the reference's backbone wrapper
    (`/root/reference/models/backbone.py:7-35`). Freezing is handled
    functionally by the optimizer mask (training/optimizer.py), not by
    mutating module state."""
    pass
