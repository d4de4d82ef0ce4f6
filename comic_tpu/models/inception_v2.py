"""Inception-V2 image encoder in pure JAX.

From-scratch functional implementation of slim's inception_v2
(/root/reference/common/nets/inception_v2.py; selectable via --cnn_name).
Structure: a separable 7x7/2 stem (depthwise multiplier 8 -> pointwise 64,
inception_v2.py:107-126) and ten inception blocks whose branch layout is
b0: 1x1 / b1: 1x1->3x3 / b2: 1x1->3x3->3x3 / b3: pool->1x1, with two
stride-2 reduction blocks (Mixed_4a, Mixed_5a). Param keys mirror slim
scope names for checkpoint conversion. BN scale=False eps=0.001, inference
mode always. num_classes=None head = global average pool -> (B, 1024).
224x224 input, inception preprocessing.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from . import layers
from .inception_v1 import BN_EPS, _conv_bn_init, _max_pool

Params = Dict[str, Any]

DEFAULT_IMAGE_SIZE = 224
FEATURE_DIM = 1024

# standard block: (b0, (b1a, b1b), (b2a, b2b), (pool_kind, b3))
_STD = {
    "Mixed_3b": (64, (64, 64), (64, 96), ("avg", 32)),
    "Mixed_3c": (64, (64, 96), (64, 96), ("avg", 64)),
    "Mixed_4b": (224, (64, 96), (96, 128), ("avg", 128)),
    "Mixed_4c": (192, (96, 128), (96, 128), ("avg", 128)),
    "Mixed_4d": (160, (128, 160), (128, 160), ("avg", 96)),
    "Mixed_4e": (96, (128, 192), (160, 192), ("avg", 96)),
    "Mixed_5b": (352, (192, 320), (160, 224), ("avg", 128)),
    "Mixed_5c": (352, (192, 320), (192, 224), ("max", 128)),
}
# reduction block: ((r0a, r0b), (r1a, r1b)) -- both end stride-2; plus maxpool
_REDUCE = {
    "Mixed_4a": ((128, 160), (64, 96)),
    "Mixed_5a": ((128, 192), (192, 256)),
}
_ORDER = ["Mixed_3b", "Mixed_3c", "Mixed_4a", "Mixed_4b", "Mixed_4c",
          "Mixed_4d", "Mixed_4e", "Mixed_5a", "Mixed_5b", "Mixed_5c"]


def _conv_bn_relu(p, x, stride, dtype=None, k=None):
    w = p["weights"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    bn = p["BatchNorm"]
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPS)
    return jax.nn.relu((y - bn["moving_mean"]) * inv + bn["beta"])


def _avg_pool(x, k, stride, padding="SAME"):
    return layers.avg_pool_same(x, k, stride, padding)


def _ck(key, kh, kw, cin, cout):
    p = _conv_bn_init(key, 1, cin, cout)
    p["weights"] = layers.slim_variance_scaling(
        key, (kh, kw, cin, cout), kh * kw * cin)
    return p


def init_params(key) -> Params:
    params: Params = {}
    key, k0, k1, k2 = jax.random.split(key, 4)
    # separable stem: depthwise (7,7,3,8) + pointwise (1,1,24,64) + BN
    dw_mult = 8
    params["Conv2d_1a_7x7"] = {
        "depthwise_weights": 0.1 * jax.random.truncated_normal(
            k0, -2.0, 2.0, (7, 7, 3, dw_mult), jnp.float32),
        "pointwise_weights": 0.1 * jax.random.truncated_normal(
            k1, -2.0, 2.0, (1, 1, 3 * dw_mult, 64), jnp.float32),
        "BatchNorm": _conv_bn_init(k2, 1, 1, 64)["BatchNorm"],
    }
    key, ka, kb = jax.random.split(key, 3)
    params["Conv2d_2b_1x1"] = _ck(ka, 1, 1, 64, 64)
    params["Conv2d_2c_3x3"] = _ck(kb, 3, 3, 64, 192)
    cin = 192
    for block_i, name in enumerate(_ORDER):
        block: Params = {}
        # fold in the block INDEX, not hash(name): Python string hashing
        # is randomized per process (PYTHONHASHSEED), which silently made
        # the same PRNGKey yield different mixed-block params in every
        # process/run
        bkey = jax.random.fold_in(key, block_i)
        if name in _REDUCE:
            (r0a, r0b), (r1a, r1b) = _REDUCE[name]
            ks = jax.random.split(bkey, 4)
            block["Branch_0"] = {
                "Conv2d_0a_1x1": _ck(ks[0], 1, 1, cin, r0a),
                "Conv2d_1a_3x3": _ck(ks[1], 3, 3, r0a, r0b)}
            block["Branch_1"] = {
                "Conv2d_0a_1x1": _ck(ks[2], 1, 1, cin, r1a),
                "Conv2d_0b_3x3": _ck(ks[3], 3, 3, r1a, r1b),
                "Conv2d_1a_3x3": _ck(jax.random.fold_in(ks[3], 1), 3, 3,
                                     r1b, r1b)}
            cout = r0b + r1b + cin
        else:
            b0, (b1a, b1b), (b2a, b2b), (pk, b3) = _STD[name]
            ks = jax.random.split(bkey, 6)
            block["Branch_0"] = {"Conv2d_0a_1x1": _ck(ks[0], 1, 1, cin, b0)}
            block["Branch_1"] = {
                "Conv2d_0a_1x1": _ck(ks[1], 1, 1, cin, b1a),
                "Conv2d_0b_3x3": _ck(ks[2], 3, 3, b1a, b1b)}
            block["Branch_2"] = {
                "Conv2d_0a_1x1": _ck(ks[3], 1, 1, cin, b2a),
                "Conv2d_0b_3x3": _ck(ks[4], 3, 3, b2a, b2b),
                "Conv2d_0c_3x3": _ck(jax.random.fold_in(ks[4], 1), 3, 3,
                                     b2b, b2b)}
            block["Branch_3"] = {"Conv2d_0b_1x1": _ck(ks[5], 1, 1, cin, b3)}
            cout = b0 + b1b + b2b + b3
        params[name] = block
        cin = cout
    return params


def apply(params: Params, images: jnp.ndarray,
          final_endpoint: str = "Mixed_5c", dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    end_points: Dict[str, jnp.ndarray] = {}
    # separable stem
    p = params["Conv2d_1a_7x7"]
    x = images
    dw = p["depthwise_weights"]  # (7, 7, 3, 8) slim layout
    if dtype is not None:
        x = x.astype(dtype)
    # depthwise conv with channel multiplier 8: grouped conv, out 24
    y = jax.lax.conv_general_dilated(
        x, _dw_kernel(dw, x.dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=3).astype(jnp.float32)
    pw = p["pointwise_weights"]
    if dtype is not None:
        y, pw = y.astype(dtype), pw.astype(dtype)
    y = jax.lax.conv_general_dilated(
        y, pw, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    bn = p["BatchNorm"]
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPS)
    net = jax.nn.relu((y - bn["moving_mean"]) * inv + bn["beta"])
    end_points["Conv2d_1a_7x7"] = net

    net = _max_pool(net, 3, 2)
    end_points["MaxPool_2a_3x3"] = net
    net = _conv_bn_relu(params["Conv2d_2b_1x1"], net, 1, dtype)
    end_points["Conv2d_2b_1x1"] = net
    net = _conv_bn_relu(params["Conv2d_2c_3x3"], net, 1, dtype)
    end_points["Conv2d_2c_3x3"] = net
    net = _max_pool(net, 3, 2)
    end_points["MaxPool_3a_3x3"] = net

    for name in _ORDER:
        block = params[name]
        # input-side 1x1 convs merged into one MXU-filling conv; see
        # layers.merged_1x1_bn_relu for the exactness argument and the
        # measured win (tools/encoder_merge_probe.py)
        if name in _REDUCE:
            b0, b1 = layers.merged_1x1_bn_relu(
                [block["Branch_0"]["Conv2d_0a_1x1"],
                 block["Branch_1"]["Conv2d_0a_1x1"]], net, BN_EPS, dtype)
            b0 = _conv_bn_relu(block["Branch_0"]["Conv2d_1a_3x3"], b0, 2, dtype)
            b1 = _conv_bn_relu(block["Branch_1"]["Conv2d_0b_3x3"], b1, 1, dtype)
            b1 = _conv_bn_relu(block["Branch_1"]["Conv2d_1a_3x3"], b1, 2, dtype)
            b2 = _max_pool(net, 3, 2)
            net = jnp.concatenate([b0, b1, b2], axis=3)
        else:
            pk = _STD[name][3][0]
            b0, b1, b2 = layers.merged_1x1_bn_relu(
                [block["Branch_0"]["Conv2d_0a_1x1"],
                 block["Branch_1"]["Conv2d_0a_1x1"],
                 block["Branch_2"]["Conv2d_0a_1x1"]], net, BN_EPS, dtype)
            b1 = _conv_bn_relu(block["Branch_1"]["Conv2d_0b_3x3"], b1, 1, dtype)
            b2 = _conv_bn_relu(block["Branch_2"]["Conv2d_0b_3x3"], b2, 1, dtype)
            b2 = _conv_bn_relu(block["Branch_2"]["Conv2d_0c_3x3"], b2, 1, dtype)
            b3 = (_avg_pool(net, 3, 1) if pk == "avg" else _max_pool(net, 3, 1))
            b3 = _conv_bn_relu(block["Branch_3"]["Conv2d_0b_1x1"], b3, 1, dtype)
            net = jnp.concatenate([b0, b1, b2, b3], axis=3)
        end_points[name] = net
        if name == final_endpoint:
            return net, end_points
    return net, end_points


def _dw_kernel(dw: jnp.ndarray, dtype) -> jnp.ndarray:
    """slim depthwise layout (H, W, Cin, M) -> grouped-conv HWIO
    (H, W, 1, Cin*M) where output c*M+m reads input channel c."""
    h, w, cin, m = dw.shape
    return jnp.transpose(dw, (0, 1, 2, 3)).reshape(h, w, 1, cin * m).astype(dtype)


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(net, axis=(1, 2))
