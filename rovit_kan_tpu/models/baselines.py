"""Baseline classifier backbones, implemented natively in flax (NHWC,
MXU-friendly convs, bf16-capable).

The reference's baseline harness pulls EfficientNet-B0, MobileNetV3-Large,
DeiT-Tiny (and earlier ResNet50) from timm (`/root/reference/experiments/
baselines.py:19-68`). There is no timm (or network egress) here, so the four
architectures are reimplemented from their published specs. ``BaselineModel``
wraps any of them to emit the same output-dict contract as RoViTKAN with the
non-classification fields zeroed (the reference emits None — see
baselines.py:30-52 there), so the trainer/evaluator run unchanged.

BatchNorm uses ``momentum=0.9`` (torch's default ``momentum=0.1`` means
``running = 0.9*running + 0.1*batch``), not flax's 0.99 default: in short
from-scratch runs the 0.99 decay leaves running stats near their init, so
train-mode accuracy looks fine while eval-mode logits collapse to uniform.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from rovit_kan_tpu.models.vit import VisionTransformer


# ---------------------------------------------------------------- ResNet50
class _Bottleneck(nn.Module):
    features: int
    strides: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         scale_init=nn.initializers.zeros, name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=jnp.float32,
                                    name="downsample_bn")(residual)
        return nn.relu(residual + y)


class ResNet50(nn.Module):
    """Standard ResNet-50 (He et al. 2015), ~23.5M params at 4 classes."""
    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if stage > 0 and b == 0 else 1
                x = _Bottleneck(64 * 2 ** stage, strides, dtype=self.dtype,
                                name=f"layer{stage + 1}_{b}")(x, train)
        return x.mean(axis=(1, 2))                       # GAP -> (B, 2048)


# ---------------------------------------------------- EfficientNet-B0 bits
def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def _hsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class _SqueezeExcite(nn.Module):
    reduced: int
    gate: Callable = nn.sigmoid
    act: Callable = nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))
        s = nn.Dense(self.reduced, dtype=self.dtype, name="fc1")(s)
        s = self.act(s)
        s = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(s)
        return x * self.gate(s)[:, None, None, :]


class _MBConv(nn.Module):
    """Inverted residual block with depthwise conv + SE (EfficientNet/
    MobileNetV3 building block)."""
    features: int
    expand: float
    kernel: int
    strides: int
    se_ratio: float = 0.25
    se_from_input: bool = True       # EffNet: SE reduced from *input* chans
    act: Callable = nn.silu
    se_gate: Callable = nn.sigmoid
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        mid = int(inp * self.expand)
        residual = x
        if mid != inp:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32, name="expand_bn")(x)
            x = self.act(x)
        x = nn.Conv(mid, (self.kernel,) * 2, strides=(self.strides,) * 2,
                    padding=self.kernel // 2, feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         name="dw_bn")(x)
        x = self.act(x)
        if self.se_ratio > 0:
            base = inp if self.se_from_input else mid
            x = _SqueezeExcite(max(1, int(base * self.se_ratio)),
                               gate=self.se_gate, act=self.act,
                               dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         name="project_bn")(x)
        if self.strides == 1 and inp == self.features:
            x = x + residual
        return x


class EfficientNetB0(nn.Module):
    """EfficientNet-B0 (Tan & Le 2019), ~4.0M params at 4 classes."""
    dtype: Any = jnp.float32
    # (expand, features, repeats, strides, kernel)
    blocks: Sequence[Tuple] = (
        (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
        (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
        (6, 320, 1, 1, 3),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         name="stem_bn")(x)
        x = nn.silu(x)
        bi = 0
        for expand, feat, reps, strides, kernel in self.blocks:
            for r in range(reps):
                x = _MBConv(feat, expand, kernel,
                            strides if r == 0 else 1, se_ratio=0.25,
                            se_from_input=True, act=nn.silu,
                            dtype=self.dtype, name=f"block{bi}")(x, train)
                bi += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         name="head_bn")(x)
        x = nn.silu(x)
        return x.mean(axis=(1, 2))                       # (B, 1280)


class MobileNetV3Large(nn.Module):
    """MobileNetV3-Large (Howard et al. 2019), ~4.2M params at 4 classes."""
    dtype: Any = jnp.float32
    # (kernel, expand_size, features, se, activation, strides)
    blocks: Sequence[Tuple] = (
        (3, 16, 16, False, "relu", 1),
        (3, 64, 24, False, "relu", 2),
        (3, 72, 24, False, "relu", 1),
        (5, 72, 40, True, "relu", 2),
        (5, 120, 40, True, "relu", 1),
        (5, 120, 40, True, "relu", 1),
        (3, 240, 80, False, "hswish", 2),
        (3, 200, 80, False, "hswish", 1),
        (3, 184, 80, False, "hswish", 1),
        (3, 184, 80, False, "hswish", 1),
        (3, 480, 112, True, "hswish", 1),
        (3, 672, 112, True, "hswish", 1),
        (5, 672, 160, True, "hswish", 2),
        (5, 960, 160, True, "hswish", 1),
        (5, 960, 160, True, "hswish", 1),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         name="stem_bn")(x)
        x = _hswish(x)
        for i, (k, exp_size, feat, se, act_name, strides) in enumerate(
                self.blocks):
            act = _hswish if act_name == "hswish" else nn.relu
            x = _MBConv(feat, exp_size / x.shape[-1], k, strides,
                        se_ratio=0.25 if se else 0.0,
                        se_from_input=False, act=act, se_gate=_hsigmoid,
                        dtype=self.dtype, name=f"block{i}")(x, train)
        x = nn.Conv(960, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32,
                         name="head_bn")(x)
        x = _hswish(x)
        x = x.mean(axis=(1, 2))                          # (B, 960)
        x = nn.Dense(1280, dtype=self.dtype, name="pre_logits")(x)
        return _hswish(x)                                # (B, 1280)


# ----------------------------------------------------------------- VGG16
class VGG16(nn.Module):
    """VGG-16 (Simonyan & Zisserman 2014), ~134M params at 4 classes.

    One of the two baselines the reference *skipped* for CPU cost
    (`/root/reference/experiments/baselines.py:62-64` — "VGG16 too big
    and slow for CPU"); on a TPU its 3x3 conv stacks are cheap MXU work,
    so the comparison the reference wanted is actually run here.
    torchvision layout (conv-relu stacks, no BatchNorm, 2x 4096 FC with
    dropout); the flatten handles any input size divisible by 32 (7x7x512
    at the canonical 224px)."""
    dtype: Any = jnp.float32
    cfg: Sequence[Any] = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                          512, 512, 512, "M", 512, 512, 512, "M")

    @nn.compact
    def __call__(self, x, train: bool = False):
        ci = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                                    name=f"conv{ci}")(x))
                ci += 1
        x = x.reshape(x.shape[0], -1)                    # (B, 7*7*512)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc2")(x))
        return x.astype(jnp.float32)                     # (B, 4096)


# -------------------------------------------------------------- Swin-Tiny
def _rel_pos_index(ws: int):
    """Static (ws^2, ws^2) index into the (2ws-1)^2 relative-bias table."""
    import numpy as np
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel[..., 0] + rel[..., 1]


def _shift_mask(H: int, W: int, ws: int, shift: int):
    """Static (nW, ws^2, ws^2) additive attention mask for SW-MSA: tokens
    from different pre-roll regions must not attend to each other."""
    import numpy as np
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    wins = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3) \
        .reshape(-1, ws * ws)
    diff = wins[:, None, :] != wins[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _window_partition(x, ws: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)           # (B*nW, N, C)


def _window_reverse(w, ws: int, H: int, W: int):
    B = w.shape[0] // ((H // ws) * (W // ws))
    x = w.reshape(B, H // ws, W // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


class _WindowAttention(nn.Module):
    dim: int
    heads: int
    ws: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        Bn, N, C = x.shape
        hd = C // self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        table = self.param(
            "rel_bias", nn.initializers.truncated_normal(0.02),
            ((2 * self.ws - 1) ** 2, self.heads))
        idx = jnp.asarray(_rel_pos_index(self.ws))
        bias = table[idx].transpose(2, 0, 1)            # (h, N, N)
        s = s + bias[None].astype(jnp.float32)
        if mask is not None:                            # (nW, N, N)
            nW = mask.shape[0]
            s = s.reshape(Bn // nW, nW, self.heads, N, N) \
                + mask[None, :, None].astype(jnp.float32)
            s = s.reshape(Bn, self.heads, N, N)
        p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32)
        o = o.astype(self.dtype).transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(o)


class _SwinBlock(nn.Module):
    dim: int
    heads: int
    ws: int
    shift: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):                               # (B, H, W, C)
        B, H, W, C = x.shape
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)).astype(self.dtype)
        if self.shift:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        wins = _window_partition(y, self.ws)
        mask = (jnp.asarray(_shift_mask(H, W, self.ws, self.shift))
                if self.shift else None)
        wins = _WindowAttention(self.dim, self.heads, self.ws,
                                dtype=self.dtype, name="attn")(wins, mask)
        y = _window_reverse(wins, self.ws, H, W)
        if self.shift:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = x + y.astype(x.dtype)
        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)).astype(self.dtype)
        z = nn.Dense(4 * C, dtype=self.dtype, name="fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(C, dtype=self.dtype, name="fc2")(z)
        return x + z.astype(x.dtype)


class _PatchMerging(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):                               # (B, H, W, C)
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)).astype(self.dtype)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTiny(nn.Module):
    """Swin-Tiny (Liu et al. 2021): patch 4, embed 96, depths (2,2,6,2),
    heads (3,6,12,24), window 7 — ~27.5M params at 4 classes.

    The second baseline the reference skipped for CPU cost
    (`/root/reference/experiments/baselines.py:62-64`). TPU-native
    formulation: window partition/reverse are static reshape+transpose,
    the SW-MSA cyclic shift is a static `jnp.roll`, and both the relative-
    position index and the shifted-window attention mask are precomputed
    static numpy constants — no dynamic shapes anywhere, everything jits
    to one program. Stochastic depth is omitted (short from-scratch runs;
    param count is unaffected)."""
    dtype: Any = jnp.float32
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="patch_norm")(
            x.astype(jnp.float32)).astype(self.dtype)
        for si, (depth, heads) in enumerate(zip(self.depths, self.heads)):
            dim = self.embed_dim * 2 ** si
            # Largest window <= the canonical 7 that divides the feature
            # map side (224px gives 56/28/14/7 — all exact; tiny test
            # images fall back to a smaller divisor, still fully static).
            ws = min(self.window, x.shape[1])
            while x.shape[1] % ws:
                ws -= 1
            for bi in range(depth):
                shift = ws // 2 if (bi % 2 == 1 and ws < x.shape[1]) else 0
                x = _SwinBlock(dim, heads, ws, shift, dtype=self.dtype,
                               name=f"stage{si}_block{bi}")(x)
            if si < len(self.depths) - 1:
                x = _PatchMerging(dtype=self.dtype,
                                  name=f"merge{si}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32))
        return x.mean(axis=(1, 2))                       # (B, 768)


class DeiTTinyClassifier(nn.Module):
    """Vanilla DeiT-Tiny classifier (the reference's strongest baseline)."""
    dtype: Any = jnp.float32
    use_pallas: bool = False
    use_fused_block: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        return VisionTransformer(image_size=x.shape[1], dtype=self.dtype,
                                 use_pallas=self.use_pallas,
                                 use_fused_block=self.use_fused_block,
                                 name="vit")(x)["features"]   # (B, 192)


BACKBONES: Dict[str, Any] = {
    "deit_tiny": DeiTTinyClassifier,
    "resnet50": ResNet50,
    "efficientnet_b0": EfficientNetB0,
    "mobilenetv3_large": MobileNetV3Large,
    "vgg16": VGG16,
    "swin_tiny": SwinTiny,
}


class BaselineModel(nn.Module):
    """Backbone + linear classifier emitting the RoViTKAN output-dict
    contract with non-classification slots zeroed (reference
    experiments/baselines.py:19-52 emits None there)."""
    backbone_name: str = "deit_tiny"
    num_classes: int = 4
    dtype: Any = jnp.float32
    # Whole-block fused Pallas kernel (transformer backbones only; the
    # param tree is identical either way, so serving can flip it on a
    # trained fp32 checkpoint — same policy as the flagship).
    use_fused_block: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, **_ignored):
        B = x.shape[0]
        kw = ({"use_fused_block": self.use_fused_block}
              if self.backbone_name == "deit_tiny" else {})
        backbone = BACKBONES[self.backbone_name](dtype=self.dtype,
                                                 name="backbone", **kw)
        feats = backbone(x, train=not deterministic)
        logits = nn.Dense(self.num_classes, name="classifier")(
            feats.astype(jnp.float32))
        return {
            "features": feats.astype(jnp.float32),
            "cls_logits": logits,
            "ordinal_logits": jnp.zeros((B, self.num_classes - 1)),
            "mu": jnp.zeros((B, 1)),
            "log_var": jnp.zeros((B, 1)),
            "kan_severity": jnp.zeros((B, 1)),
        }

    @property
    def head_mask(self) -> Dict[str, bool]:
        return {"ordinal": False, "uncertainty": False, "kan": False}

    with_kan = False          # evaluator severity-fallback flag
