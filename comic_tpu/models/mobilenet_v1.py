"""MobileNet-V1 image encoder in pure JAX.

From-scratch functional implementation of slim's mobilenet_v1
(/root/reference/common/nets/mobilenet_v1.py; selectable via --cnn_name).
Parameter layout mirrors slim (Conv2d_0, Conv2d_{i}_depthwise /
Conv2d_{i}_pointwise with BatchNorm) for checkpoint conversion. BN:
scale=True, eps=0.001, inference mode always. num_classes=None head =
global average pool -> (B, 1024). Uses inception preprocessing ([-1, 1]).

Depthwise convolutions map to lax.conv_general_dilated with
feature_group_count = channels; the depthwise kernels keep slim's
(H, W, C, 1) layout on disk and are reshaped at apply time.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import layers

Params = Dict[str, Any]

BN_EPS = 0.001
DEFAULT_IMAGE_SIZE = 224
FEATURE_DIM = 1024

# (stride, output channels) for the 13 separable blocks
_BLOCKS = [(1, 64), (2, 128), (1, 128), (2, 256), (1, 256), (2, 512),
           (1, 512), (1, 512), (1, 512), (1, 512), (1, 512), (2, 1024),
           (1, 1024)]


def _bn_params(cout):
    return {
        "beta": jnp.zeros((cout,), jnp.float32),
        "gamma": jnp.ones((cout,), jnp.float32),
        "moving_mean": jnp.zeros((cout,), jnp.float32),
        "moving_variance": jnp.ones((cout,), jnp.float32),
    }


def _conv_init(key, shape):
    return layers.slim_variance_scaling(
        key, shape, shape[0] * shape[1] * shape[2])


def init_params(key, depth_multiplier: float = 1.0) -> Params:
    def d(c):
        return max(int(c * depth_multiplier), 8)

    params: Params = {}
    key, sub = jax.random.split(key)
    params["Conv2d_0"] = {"weights": _conv_init(sub, (3, 3, 3, d(32))),
                          "BatchNorm": _bn_params(d(32))}
    cin = d(32)
    for i, (stride, cout) in enumerate(_BLOCKS, 1):
        cout = d(cout)
        key, k1, k2 = jax.random.split(key, 3)
        params[f"Conv2d_{i}_depthwise"] = {
            "depthwise_weights": _conv_init(k1, (3, 3, cin, 1)),
            "BatchNorm": _bn_params(cin)}
        params[f"Conv2d_{i}_pointwise"] = {
            "weights": _conv_init(k2, (1, 1, cin, cout)),
            "BatchNorm": _bn_params(cout)}
        cin = cout
    return params


def _bn_relu6(bn, y):
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPS) * bn["gamma"]
    y = (y - bn["moving_mean"]) * inv + bn["beta"]
    return jnp.minimum(jax.nn.relu(y), 6.0)


def apply(params: Params, images: jnp.ndarray,
          final_endpoint: str = "Conv2d_13_pointwise", dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    end_points: Dict[str, jnp.ndarray] = {}
    w = params["Conv2d_0"]["weights"]
    x = images
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    net = jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    net = _bn_relu6(params["Conv2d_0"]["BatchNorm"], net)
    end_points["Conv2d_0"] = net

    for i, (stride, _) in enumerate(_BLOCKS, 1):
        dw = params[f"Conv2d_{i}_depthwise"]
        cin = net.shape[-1]
        kernel = dw["depthwise_weights"]  # (3, 3, C, 1) slim layout
        kernel = jnp.transpose(kernel, (0, 1, 3, 2)).reshape(3, 3, 1, cin)
        x = net
        if dtype is not None:
            x, kernel = x.astype(dtype), kernel.astype(dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cin).astype(jnp.float32)
        net = _bn_relu6(dw["BatchNorm"], y)
        end_points[f"Conv2d_{i}_depthwise"] = net

        pw = params[f"Conv2d_{i}_pointwise"]
        x, wpt = net, pw["weights"]
        if dtype is not None:
            x, wpt = x.astype(dtype), wpt.astype(dtype)
        y = jax.lax.conv_general_dilated(
            x, wpt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
        net = _bn_relu6(pw["BatchNorm"], y)
        ep = f"Conv2d_{i}_pointwise"
        end_points[ep] = net
        if ep == final_endpoint:
            return net, end_points
    return net, end_points


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(net, axis=(1, 2))
