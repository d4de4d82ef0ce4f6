"""Primitive layers: initializers, dense, layer norm, head reshapes.

Pure functions over explicit parameter pytrees (nested dicts of jnp arrays).
Replaces the reference's variable-scope primitives
(/root/reference/common/ops.py:184-312 linear/layer_norm_activate and
/root/reference/common/ops_rnn.py:246-280 split/combine heads) with a
functional, jit/vmap/pjit-friendly design.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# --- initializers ---------------------------------------------------------

def xavier_uniform(key, shape, dtype=jnp.float32):
    """slim.xavier_initializer equivalent (uniform Glorot)."""
    fan_in, fan_out = _fans(shape)
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def he_uniform(key, shape, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    limit = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# stddev correction of a normal truncated at +/-2 sigma — the exact
# constant tf's variance_scaling_initializer divides by
_TRUNC_CORRECTION = 0.87962566103423978


def slim_variance_scaling(key, shape, fan: int, dtype=jnp.float32):
    """slim.variance_scaling_initializer(factor=2.0, truncated normal):
    stddev = sqrt(2/fan) / 0.8796... (slim initializers; e.g. the
    inception arg scope, slim/nets/inception_utils.py:79). ``fan`` is
    fan_in under the inception/resnet/mobilenet scopes and fan_out under
    nasnet's. Shared by every encoder so the bit-exactness-critical
    constant lives in exactly one place."""
    std = jnp.sqrt(2.0 / max(fan, 1)) / _TRUNC_CORRECTION
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def merged_1x1_bn_relu(parts, x, eps, dtype=None):
    """Run N independent (1x1, stride-1, SAME) conv + frozen-BN + relu
    branches over the SAME input as ONE conv with concatenated output
    channels, returning the per-branch outputs.

    Each output channel of a 1x1 conv is an independent dot over the same
    input window, so concatenating the branch kernels along the output
    axis computes exactly the per-branch convs (the frozen per-channel BN
    affines concatenate along). XLA does not horizontally fuse independent
    convs, and the small per-branch output counts (16-384 across the
    inception family) pad the MXU lanes — the merged conv fills them.
    Measured on the flagship inception_v1 encoder at the b128 serving
    batch (tools/encoder_merge_probe.py): 5.162 -> 4.653 ms end-to-end
    (1.109x). Exact in f32 (max rel diff 1.1e-6 vs per-branch convs);
    bf16 differs only in rounding order (~5e-3 max rel).

    `parts` are conv param dicts ({"weights", "BatchNorm"}) whose kernels
    must all be 1x1; shared by the inception v1/v2/v3/v4 mixed blocks and
    the inception_resnet_v2 residual blocks. The merge is in-graph only:
    param trees, checkpoints and the slim converter are untouched.

    CALL-SITE CONTRACT: the merged conv runs stride-1 SAME — only branches
    whose first conv is 1x1/stride-1/SAME may be merged (a strided 1x1,
    e.g. a resnet shortcut, would silently compute the wrong activations;
    stride/padding live at the call site, so they cannot be validated
    here — the kernel shape can be, and is, with a real raise rather than
    an assert so `python -O` keeps the check).
    """
    for q in parts:
        if tuple(q["weights"].shape[:2]) != (1, 1):
            raise ValueError(
                f"merged_1x1_bn_relu got a {q['weights'].shape[:2]} "
                "kernel — only 1x1/stride-1/SAME first convs are "
                "mergeable.")
    w = jnp.concatenate([q["weights"] for q in parts], axis=3)
    xin = x if dtype is None else x.astype(dtype)
    y = jax.lax.conv_general_dilated(
        xin, w.astype(xin.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    mean = jnp.concatenate([q["BatchNorm"]["moving_mean"] for q in parts])
    var = jnp.concatenate(
        [q["BatchNorm"]["moving_variance"] for q in parts])
    beta = jnp.concatenate([q["BatchNorm"]["beta"] for q in parts])
    y = jax.nn.relu((y - mean) * jax.lax.rsqrt(var + eps) + beta)
    outs, c0 = [], 0
    for q in parts:
        c1 = c0 + q["weights"].shape[3]
        outs.append(y[..., c0:c1])
        c0 = c1
    return outs


def avg_pool_same(x, k: int, stride: int = 1, padding: str = "SAME"):
    """tf.nn.avg_pool semantics: edge windows divide by the number of
    IN-BOUNDS elements (count normalization), unlike a plain mean over
    the padded window. Shared by the inception_v2/v3, inception_resnet_v2
    and nasnet encoders."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, stride, stride, 1), padding)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, k, 1), (1, stride, stride, 1),
        padding)
    return summed / counts


def _fans(shape):
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        return shape
    # conv kernels HWIO
    receptive = math.prod(shape[:-2])
    return shape[-2] * receptive, shape[-1] * receptive


def get_initializer(name: Optional[str]) -> Callable:
    """'xavier' | 'he' | None (TF default for Dense is glorot_uniform too)."""
    if name in (None, "none", "xavier"):
        return xavier_uniform
    if name == "he":
        return he_uniform
    raise ValueError(f"Unknown initialiser: {name}")


# --- dense ----------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True,
               init: Callable = xavier_uniform) -> Params:
    p = {"kernel": init(key, (in_dim, out_dim))}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def dense_apply(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """y = x @ W (+ b). With `dtype` set, the matmul runs in that dtype
    (bfloat16 on TPU feeds the MXU) and accumulates in float32."""
    kernel = p["kernel"]
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    y = jnp.matmul(x, kernel, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y


# --- layer norm -----------------------------------------------------------

def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm_apply(p: Params, x: jnp.ndarray, eps: float = 1e-12,
                     activation: Optional[Callable] = None) -> jnp.ndarray:
    """LayerNorm over the last axis followed by an optional activation.

    Matches ``layer_norm_activate`` semantics with begin_norm_axis=-1
    (common/ops.py:241-277); TF's contrib layer_norm uses variance with
    epsilon=1e-12 by default.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    if activation is not None:
        y = activation(y)
    return y.astype(x.dtype)


# --- multi-head reshapes (ops_rnn.py:246-280) ------------------------------

def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, L, C) -> (B, H, L, C // H)."""
    b, l, c = x.shape
    if c % num_heads != 0:
        raise ValueError(f"Channels {c} not divisible by heads {num_heads}")
    return x.reshape(b, l, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def combine_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, D) -> (B, L, H * D)."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


# --- misc -----------------------------------------------------------------

def l2_loss(params, decay: float) -> jnp.ndarray:
    """decay * sum_v ||v||^2 / 2 over every leaf (ops.py:184-190)."""
    leaves = jax.tree_util.tree_leaves(params)
    if not leaves or decay <= 0:
        return jnp.float32(0.0)
    return decay * sum(0.5 * jnp.sum(jnp.square(v.astype(jnp.float32)))
                       for v in leaves)


def count_params(params) -> int:
    """Trainable-parameter count (ops.get_model_size, common/ops.py:62-91)."""
    return sum(int(math.prod(v.shape)) for v in jax.tree_util.tree_leaves(params))
