"""Inception-V1 (GoogLeNet) image encoder in pure JAX.

From-scratch functional implementation of the slim network the reference uses
as its default encoder (/root/reference/common/nets/inception_v1.py, selected
at src/train.py:56-57). The architecture is expressed as a data table of
blocks instead of 300 lines of scope plumbing; parameters live in a nested
dict keyed by the slim endpoint/branch names so TF-slim checkpoints convert
1:1 (see comic_tpu/utils/tf_checkpoint.py).

Key behavioral contracts:
  - endpoint names Conv2d_1a_7x7 ... Mixed_5c match slim exactly; the
    attention feature map is end_points['Mixed_4f'] = (B, 14, 14, 832) at
    224x224 input (model_base.py:93-104).
  - BatchNorm runs in inference mode ALWAYS — the reference builds the CNN
    with is_training=False even when fine-tuning (model_base.py:72-76), so
    BN is a frozen affine: scale=False, center=True, eps=0.001
    (inception_utils.py:31-67). Moving stats are parameters, never updated.
  - num_classes=None semantics: the head is a 7x7 VALID average pool, no
    logits (inception_v1.py:320-333, nets_factory.py:116-159).

TPU notes: convs run NHWC/HWIO via lax.conv_general_dilated with optional
bfloat16 compute (fp32 accumulation). The frozen BN folds into a per-channel
scale/offset that XLA fuses into the preceding conv.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import layers

Params = Dict[str, Any]

# (name, kind, spec)
#   conv: (filters, kernel, stride)
#   pool: (kernel, stride)  -- max pool, SAME padding
#   mixed: (b0, (b1a, b1b), (b2a, b2b), b3) 1x1/3x3 inception branch filters
_V1_BLOCKS: List[Tuple[str, str, tuple]] = [
    ("Conv2d_1a_7x7", "conv", (64, 7, 2)),
    ("MaxPool_2a_3x3", "pool", (3, 2)),
    ("Conv2d_2b_1x1", "conv", (64, 1, 1)),
    ("Conv2d_2c_3x3", "conv", (192, 3, 1)),
    ("MaxPool_3a_3x3", "pool", (3, 2)),
    ("Mixed_3b", "mixed", (64, (96, 128), (16, 32), 32)),
    ("Mixed_3c", "mixed", (128, (128, 192), (32, 96), 64)),
    ("MaxPool_4a_3x3", "pool", (3, 2)),
    ("Mixed_4b", "mixed", (192, (96, 208), (16, 48), 64)),
    ("Mixed_4c", "mixed", (160, (112, 224), (24, 64), 64)),
    ("Mixed_4d", "mixed", (128, (128, 256), (24, 64), 64)),
    ("Mixed_4e", "mixed", (112, (144, 288), (32, 64), 64)),
    ("Mixed_4f", "mixed", (256, (160, 320), (32, 128), 128)),
    ("MaxPool_5a_2x2", "pool", (2, 2)),
    ("Mixed_5b", "mixed", (256, (160, 320), (32, 128), 128)),
    ("Mixed_5c", "mixed", (384, (192, 384), (48, 128), 128)),
]

#: slim names of the convs inside an inception block, in concat order.
_BRANCH_CONVS = (
    ("Branch_0", ("Conv2d_0a_1x1",)),
    ("Branch_1", ("Conv2d_0a_1x1", "Conv2d_0b_3x3")),
    ("Branch_2", ("Conv2d_0a_1x1", "Conv2d_0b_3x3")),
    ("Branch_3", ("Conv2d_0b_1x1",)),  # after a 3x3/1 max pool
)

DEFAULT_IMAGE_SIZE = 224
FEATURE_DIM = 1024
BN_EPS = 0.001


def _truncated_normal_scaled(key, shape, dtype=jnp.float32):
    """slim.variance_scaling_initializer default: factor=2.0, mode=FAN_IN,
    truncated normal (inception_utils.py:79)."""
    return layers.slim_variance_scaling(
        key, shape, shape[0] * shape[1] * shape[2], dtype)


def _conv_bn_init(key, k: int, cin: int, cout: int) -> Params:
    return {
        "weights": _truncated_normal_scaled(key, (k, k, cin, cout)),
        "BatchNorm": {
            "beta": jnp.zeros((cout,), jnp.float32),
            "moving_mean": jnp.zeros((cout,), jnp.float32),
            "moving_variance": jnp.ones((cout,), jnp.float32),
        },
    }


def init_params(key) -> Params:
    """Build the full Inception-V1 parameter pytree (no logits head)."""
    params: Params = {}
    cin = 3
    for name, kind, spec in _V1_BLOCKS:
        key, sub = jax.random.split(key)
        if kind == "conv":
            filters, k, _ = spec
            params[name] = _conv_bn_init(sub, k, cin, filters)
            cin = filters
        elif kind == "mixed":
            b0, (b1a, b1b), (b2a, b2b), b3 = spec
            ks = jax.random.split(sub, 6)
            params[name] = {
                "Branch_0": {"Conv2d_0a_1x1": _conv_bn_init(ks[0], 1, cin, b0)},
                "Branch_1": {
                    "Conv2d_0a_1x1": _conv_bn_init(ks[1], 1, cin, b1a),
                    "Conv2d_0b_3x3": _conv_bn_init(ks[2], 3, b1a, b1b),
                },
                "Branch_2": {
                    "Conv2d_0a_1x1": _conv_bn_init(ks[3], 1, cin, b2a),
                    "Conv2d_0b_3x3": _conv_bn_init(ks[4], 3, b2a, b2b),
                },
                "Branch_3": {"Conv2d_0b_1x1": _conv_bn_init(ks[5], 1, cin, b3)},
            }
            cin = b0 + b1b + b2b + b3
        # pools have no params
    return params


def _conv_bn_relu(p: Params, x: jnp.ndarray, stride: int, dtype=None) -> jnp.ndarray:
    w = p["weights"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    # conv runs fully in the compute dtype (mixed-dtype conv has no VJP);
    # the f32 cast below feeds the f32 BN math and XLA fuses it away
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    bn = p["BatchNorm"]
    # frozen inference-mode BN (scale=False): XLA folds this into the conv
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPS)
    y = (y - bn["moving_mean"]) * inv + bn["beta"]
    return jax.nn.relu(y)


def _max_pool(x: jnp.ndarray, k: int, stride: int,
              padding: str = "SAME") -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), padding)


def _mixed_block(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Inception mixed block with the three input-side 1x1 convs
    (Branch_0, Branch_1/2 reduces) merged into one MXU-filling conv —
    see layers.merged_1x1_bn_relu for the exactness argument and the
    measured 1.109x encoder win (tools/encoder_merge_probe.py).
    Reference: slim inception_v1 Mixed blocks (inception_v1.py:96-563).
    """
    b0, b1, b2 = layers.merged_1x1_bn_relu(
        [p["Branch_0"]["Conv2d_0a_1x1"], p["Branch_1"]["Conv2d_0a_1x1"],
         p["Branch_2"]["Conv2d_0a_1x1"]], x, BN_EPS, dtype)
    b1 = _conv_bn_relu(p["Branch_1"]["Conv2d_0b_3x3"], b1, 1, dtype)
    b2 = _conv_bn_relu(p["Branch_2"]["Conv2d_0b_3x3"], b2, 1, dtype)
    b3 = _max_pool(x, 3, 1)
    b3 = _conv_bn_relu(p["Branch_3"]["Conv2d_0b_1x1"], b3, 1, dtype)
    return jnp.concatenate([b0, b1, b2, b3], axis=3)


def apply(params: Params, images: jnp.ndarray,
          final_endpoint: str = "Mixed_5c", dtype=None,
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Run the base network up to `final_endpoint`.

    Args:
      images: (B, H, W, 3) preprocessed to [-1, 1].
    Returns:
      (net, end_points) with slim-compatible endpoint names.
    """
    end_points: Dict[str, jnp.ndarray] = {}
    net = images
    for name, kind, spec in _V1_BLOCKS:
        if kind == "conv":
            _, k, stride = spec
            net = _conv_bn_relu(params[name], net, stride, dtype)
        elif kind == "pool":
            k, stride = spec
            net = _max_pool(net, k, stride)
        else:
            net = _mixed_block(params[name], net, dtype)
        end_points[name] = net
        if name == final_endpoint:
            return net, end_points
    raise ValueError(f"Unknown final endpoint {final_endpoint}")


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    """num_classes=None head: global average pool -> (B, 1024).

    slim uses a fixed 7x7 VALID avg pool at 224 input (inception_v1.py:326);
    a mean over the spatial axes is identical there and also handles other
    input sizes (global_pool=True branch, inception_v1.py:320-323).
    """
    return jnp.mean(net, axis=(1, 2))
