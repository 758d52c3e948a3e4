"""Spatial-temporal connector baselines (the VideoLLaMA2 projectors).

Architectural equivalents of the reference connectors
(/root/reference/streammind/model/multimodal_projector/builder.py:574-793):
  - STCConnector (:574-749): RegStage → Conv3d(2,2,2) downsample (pad 1) →
    RegStage → 2-layer GELU MLP readout
  - STPConnector (:752): downsampler is AvgPool3d + SiLU
  - STCConnectorV35 (:761): Conv3d downsampler without padding
  - SpatialConv (:780) / SpatialPool (:788)

The RegNet stage is reimplemented natively (residual bottleneck blocks with
group conv + SE, SiLU, LayerNorm2d) rather than imported from timm; weights
are therefore not interchangeable with timm checkpoints, but shapes,
downsampling behavior and token counts match.  XLA lowers the convs to MXU
einsums.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import StreamMindConfig
from ..utils.params import linear, normal_init, ones, torch_linear_init, zeros


# ---------------------------------------------------------------------------
# Primitives (NCHW layouts; channels-last internally for TPU friendliness)
# ---------------------------------------------------------------------------
def conv2d(x, w, b=None, stride=1, padding="SAME", groups=1):
    """x: (N, C, H, W); w: (O, I/groups, kh, kw)."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def conv3d(x, w, b=None, stride=(1, 1, 1), padding="VALID"):
    """x: (N, C, T, H, W); w: (O, I, kt, kh, kw)."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None, None]
    return out


def layer_norm_2d(x, weight, bias, eps=1e-6):
    """LayerNorm over channels of (N, C, H, W) (timm LayerNorm2d)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * weight[None, :, None, None] + bias[None, :, None, None]


# ---------------------------------------------------------------------------
# RegNet-style stage
# ---------------------------------------------------------------------------
_GROUP_WIDTH = 64
_SE_RATIO = 0.25


def _init_conv(key, out_c, in_c, k, dtype=jnp.float32):
    fan_in = in_c * k * k
    std = math.sqrt(2.0 / fan_in)
    return normal_init(key, (out_c, in_c, k, k), std=std, dtype=dtype)


def _group_count(out_c: int) -> int:
    """Largest divisor of out_c not exceeding out_c // GROUP_WIDTH (timm
    rounds widths; arbitrary widths here must still divide evenly or the
    grouped conv is ill-formed)."""
    g = max(out_c // _GROUP_WIDTH, 1)
    while g > 1 and out_c % g != 0:
        g -= 1
    return g


def init_reg_block(key, in_c, out_c, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    groups = _group_count(out_c)
    se_c = max(int(in_c * _SE_RATIO), 8)
    p = {
        "conv1": _init_conv(ks[0], out_c, in_c, 1, dtype),
        "ln1": {"weight": ones((out_c,), dtype), "bias": zeros((out_c,), dtype)},
        "conv2": _init_conv(ks[1], out_c, out_c // groups, 3, dtype),
        "ln2": {"weight": ones((out_c,), dtype), "bias": zeros((out_c,), dtype)},
        "se_fc1": _init_conv(ks[2], se_c, out_c, 1, dtype),
        "se_fc2": _init_conv(ks[3], out_c, se_c, 1, dtype),
        "conv3": _init_conv(ks[4], out_c, out_c, 1, dtype),
        "ln3": {"weight": ones((out_c,), dtype), "bias": zeros((out_c,), dtype)},
    }
    if in_c != out_c:
        p["proj"] = _init_conv(ks[5], out_c, in_c, 1, dtype)
    return p


def reg_block(x, p):
    shortcut = x
    if "proj" in p:
        shortcut = conv2d(x, p["proj"])
        # timm's downsample is ConvNormAct(apply_act=False): conv + norm.
        # Scratch inits omit the norm (identity-affine at init); converted
        # timm weights carry it as proj_ln.
        if "proj_ln" in p:
            shortcut = layer_norm_2d(shortcut, **_ln(p["proj_ln"]))
    y = jax.nn.silu(layer_norm_2d(conv2d(x, p["conv1"]), **_ln(p["ln1"])))
    # depth-wise group count is recoverable from the kernel shape (O, I/g, k, k)
    groups = p["conv2"].shape[0] // p["conv2"].shape[1]
    y = jax.nn.silu(
        layer_norm_2d(conv2d(y, p["conv2"], groups=groups), **_ln(p["ln2"]))
    )
    # squeeze-excite (timm SEModule carries conv biases; scratch init doesn't)
    se = jnp.mean(y, axis=(2, 3), keepdims=True)
    se = jax.nn.silu(conv2d(se, p["se_fc1"], p.get("se_fc1_bias")))
    se = jax.nn.sigmoid(conv2d(se, p["se_fc2"], p.get("se_fc2_bias")))
    y = y * se
    y = layer_norm_2d(conv2d(y, p["conv3"]), **_ln(p["ln3"]))
    return jax.nn.silu(shortcut + y)


def _ln(d):
    return {"weight": d["weight"], "bias": d["bias"]}


def init_reg_stage(key, depth, in_c, out_c, dtype=jnp.float32):
    ks = jax.random.split(key, max(depth, 1))
    blocks = []
    for i in range(depth):
        blocks.append(init_reg_block(ks[i], in_c if i == 0 else out_c, out_c, dtype))
    return blocks


def reg_stage(x, blocks):
    for b in blocks:
        x = reg_block(x, b)
    return x


# ---------------------------------------------------------------------------
# Connectors
# ---------------------------------------------------------------------------
def init_stc_connector(
    key, cfg: StreamMindConfig, depth=4, mlp_depth=2,
    downsample=(2, 2, 2), variant="stc", dtype=jnp.float32,
):
    """depth=0 (the SpatialConv/SpatialPool configuration,
    builder.py:780-794) replaces both RegNet stages with identity; the
    reference then still DECLARES its Conv3d/readout at hidden_size, which
    cannot run when mm_hidden != hidden — scratch init here sizes those
    layers to the actual incoming channels so the module works, while the
    checkpoint converter copies whatever shapes a released file carries."""
    ks = jax.random.split(key, 4 + mlp_depth)
    enc, hid = cfg.mm_hidden_size, cfg.text.hidden_size
    conv_in = enc if depth == 0 else hid
    read_in = hid if variant in ("stc", "stc_v35") or depth > 0 else enc
    p = {
        "s1": init_reg_stage(ks[0], depth, enc, hid, dtype),
        "s2": init_reg_stage(ks[1], depth, hid, hid, dtype),
        "readout": [torch_linear_init(ks[2], hid, read_in, dtype=dtype)]
        + [torch_linear_init(ks[4 + i], hid, hid, dtype=dtype)
           for i in range(mlp_depth - 1)],
    }
    if variant in ("stc", "stc_v35"):
        dt, dh, dw = downsample
        std = math.sqrt(2.0 / (conv_in * dt * dh * dw))
        p["sampler"] = {
            # ks[3] — NOT ks[4], which seeds the second readout layer
            # (reusing it made sampler and readout[1] correlated draws)
            "weight": normal_init(ks[3], (hid, conv_in, dt, dh, dw), std=std, dtype=dtype),
            "bias": zeros((hid,), dtype),
        }
    return p


def stc_forward(
    x: jax.Array, p, variant: str = "stc", downsample: Tuple[int, int, int] = (2, 2, 2)
) -> jax.Array:
    """x: (B, T, L, D) patch features → (B, tokens, hidden).

    Pipeline mirrors STCConnector.forward (builder.py:633-700): 2D stage per
    frame → 3D downsample over (t, h, w) → 2D stage → flatten → MLP readout.
    """
    b, t, l, d = x.shape
    hw = int(math.isqrt(l))
    x = x.reshape(b, t, hw, hw, d).transpose(0, 4, 1, 2, 3)  # b d t h w

    x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, -1, hw, hw)
    x2 = reg_stage(x2, p["s1"])
    hid = x2.shape[1]
    x = x2.reshape(b, t, hid, hw, hw).transpose(0, 2, 1, 3, 4)  # b d t h w

    dt, dh, dw = downsample
    if variant == "stc":
        # Conv3d stride=downsample, padding=1 on every axis
        x = conv3d(
            x, p["sampler"]["weight"], p["sampler"]["bias"],
            stride=(dt, dh, dw), padding=((1, 1), (1, 1), (1, 1)),
        )
        x = jax.nn.silu(x)
    elif variant == "stc_v35":
        x = conv3d(
            x, p["sampler"]["weight"], p["sampler"]["bias"],
            stride=(dt, dh, dw), padding="VALID",
        )
        x = jax.nn.silu(x)
    else:  # stp: average pool
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            (1, 1, dt, dh, dw), (1, 1, dt, dh, dw), "VALID",
        ) / float(dt * dh * dw)
        x = jax.nn.silu(x)

    # channel count can change at the sampler (depth-0 spatial variants
    # keep encoder channels into the pool / conv out-channels afterwards)
    hid = x.shape[1]
    new_t, new_h, new_w = x.shape[2], x.shape[3], x.shape[4]
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * new_t, hid, new_h, new_w)
    x2 = reg_stage(x2, p["s2"])
    x = x2.reshape(b, new_t, hid, new_h, new_w).transpose(0, 1, 3, 4, 2)
    x = x.reshape(b, new_t * new_h * new_w, hid)

    out = linear(x, p["readout"][0])
    for layer in p["readout"][1:]:
        out = linear(jax.nn.gelu(out, approximate=False), layer)
    return out


# SpatialConv/SpatialPool ARE depth-0 STC/STP connectors with spatial-only
# downsampling (reference builder.py:780-794: both subclasses only change
# the constructor args depth=0, downsample=(1, 2, 2)) — identity stages,
# Conv3d(kernel=(1,2,2), stride=(1,2,2), padding=1) or AvgPool3d((1,2,2)),
# SiLU, then the 2-layer MLP readout.
SPATIAL_DOWNSAMPLE = (1, 2, 2)


def init_spatial_conv(key, cfg: StreamMindConfig, dtype=jnp.float32):
    return init_stc_connector(
        key, cfg, depth=0, mlp_depth=2, downsample=SPATIAL_DOWNSAMPLE,
        variant="stc", dtype=dtype,
    )


def init_spatial_pool(key, cfg: StreamMindConfig, dtype=jnp.float32):
    return init_stc_connector(
        key, cfg, depth=0, mlp_depth=2, downsample=SPATIAL_DOWNSAMPLE,
        variant="stp", dtype=dtype,
    )


def spatial_conv_forward(x: jax.Array, p) -> jax.Array:
    return stc_forward(x, p, variant="stc", downsample=SPATIAL_DOWNSAMPLE)


def spatial_pool_forward(x: jax.Array, p) -> jax.Array:
    return stc_forward(x, p, variant="stp", downsample=SPATIAL_DOWNSAMPLE)
