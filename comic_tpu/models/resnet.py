"""ResNet-v1 image encoders (50/101/152) in pure JAX.

From-scratch functional implementation of the slim resnet_v1 family the
reference exposes through its encoder zoo
(/root/reference/common/nets/resnet_v1.py + resnet_utils.py; selectable via
--cnn_name, SURVEY.md §2.5). Parameter naming mirrors the slim variable
layout (block{i}/unit_{j}/bottleneck_v1/{shortcut,conv1..3}) so slim
ImageNet checkpoints convert mechanically.

slim-v1 semantics preserved:
  - the root is a 7x7/2 conv + BN + relu and a SAME 3x3/2 max pool;
  - stride-2 convs use slim's ``conv2d_same`` fixed padding (explicit
    (k-1)//2 both-sides pad + VALID, resnet_utils.py:77-122) — NOT plain
    'SAME', which pads differently on even inputs;
  - each bottleneck is 1x1 -> 3x3(stride) -> 1x1 with BN after every conv,
    relu on the first two, and relu(residual + shortcut) at the end;
  - the subsampling stride sits on the LAST unit of each block (slim
    convention, not the torchvision first-unit convention);
  - BN: scale=True, eps=1e-5, inference mode always (the reference builds
    every encoder with is_training=False, model_base.py:72-76);
  - num_classes=None head = global average pool -> (B, 2048).

Inputs use VGG-style preprocessing (mean-subtracted 0-255 RGB,
preprocessing_factory.py:31-84).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from . import layers

Params = Dict[str, Any]

BN_EPS = 1e-5

# name -> per-block unit counts
RESNET_V1_UNITS = {
    "resnet_v1_50": (3, 4, 6, 3),
    "resnet_v1_101": (3, 4, 23, 3),
    "resnet_v1_152": (3, 8, 36, 3),
}
_BLOCK_DEPTHS = (64, 128, 256, 512)  # bottleneck inner depths
DEFAULT_IMAGE_SIZE = 224
FEATURE_DIM = 2048


def _conv_init(key, k, cin, cout):
    return {
        "weights": layers.slim_variance_scaling(
            key, (k, k, cin, cout), k * k * cin),
        "BatchNorm": {
            "beta": jnp.zeros((cout,), jnp.float32),
            "gamma": jnp.ones((cout,), jnp.float32),
            "moving_mean": jnp.zeros((cout,), jnp.float32),
            "moving_variance": jnp.ones((cout,), jnp.float32),
        },
    }


def _same_pad(k: int, stride: int):
    """slim's ``conv2d_same`` padding (resnet_utils.py:77-122): for stride>1
    it pads a FIXED (k-1)//2 / (k-1)-(k-1)//2 then convolves VALID, which
    differs from TF 'SAME' on even-sized inputs (SAME would pad k-stride
    total). Stride 1 is plain SAME."""
    if stride == 1:
        return "SAME"
    lo = (k - 1) // 2
    return [(lo, k - 1 - lo)] * 2


def _conv_bn(p, x, stride, dtype=None, relu=True):
    w = p["weights"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), _same_pad(w.shape[0], stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    bn = p["BatchNorm"]
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPS) * bn["gamma"]
    y = (y - bn["moving_mean"]) * inv + bn["beta"]
    return jax.nn.relu(y) if relu else y


def init_params(key, name: str = "resnet_v1_50") -> Params:
    units = RESNET_V1_UNITS[name]
    params: Params = {}
    key, sub = jax.random.split(key)
    params["conv1"] = _conv_init(sub, 7, 3, 64)
    cin = 64
    for bi, (n_units, depth) in enumerate(zip(units, _BLOCK_DEPTHS), 1):
        block: Params = {}
        cout = depth * 4
        for ui in range(1, n_units + 1):
            key, *ks = jax.random.split(key, 5)
            unit: Params = {
                "conv1": _conv_init(ks[0], 1, cin, depth),
                "conv2": _conv_init(ks[1], 3, depth, depth),
                "conv3": _conv_init(ks[2], 1, depth, cout),
            }
            if cin != cout:
                unit["shortcut"] = _conv_init(ks[3], 1, cin, cout)
            block[f"unit_{ui}"] = {"bottleneck_v1": unit}
            cin = cout
        params[f"block{bi}"] = block
    return params


def apply(params: Params, images: jnp.ndarray, name: str = "resnet_v1_50",
          final_endpoint: str = "block4", dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    units = RESNET_V1_UNITS[name]
    end_points: Dict[str, jnp.ndarray] = {}
    net = _conv_bn(params["conv1"], images, 2, dtype)
    end_points["conv1"] = net
    net = jax.lax.reduce_window(net, -jnp.inf, jax.lax.max,
                                (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
    end_points["pool1"] = net
    for bi, n_units in enumerate(units, 1):
        bname = f"block{bi}"
        block = params[bname]
        for ui in range(1, n_units + 1):
            # slim: stride 2 on the LAST unit of blocks 1-3
            stride = 2 if (ui == n_units and bi < 4) else 1
            net = _bottleneck(block[f"unit_{ui}"]["bottleneck_v1"], net,
                              stride, dtype)
        end_points[bname] = net
        if bname == final_endpoint:
            return net, end_points
    return net, end_points


def _bottleneck(p: Params, x: jnp.ndarray, stride: int, dtype=None
                ) -> jnp.ndarray:
    if "shortcut" in p:
        shortcut = _conv_bn(p["shortcut"], x, stride, dtype, relu=False)
    elif stride > 1:
        shortcut = x[:, ::stride, ::stride, :]
    else:
        shortcut = x
    y = _conv_bn(p["conv1"], x, 1, dtype)
    y = _conv_bn(p["conv2"], y, stride, dtype)
    y = _conv_bn(p["conv3"], y, 1, dtype, relu=False)
    return jax.nn.relu(shortcut + y)


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(net, axis=(1, 2))
