"""MobileNet-V2 image encoder in pure JAX.

From-scratch functional implementation of slim's mobilenet_v2
(/root/reference/common/nets/mobilenet/mobilenet_v2.py + mobilenet.py +
conv_blocks.py; selectable via --cnn_name). Inverted-residual blocks
(expand 1x1 -> depthwise 3x3 -> project 1x1, residual add when stride 1 and
channels match), relu6, BN scale=True eps=0.001 in inference mode always.
Param keys mirror slim ('Conv', 'expanded_conv', 'expanded_conv_1'..'_16',
'Conv_1' with expand/depthwise/project subscopes). num_classes=None head =
final 1x1 conv to 1280 + global pool. Inception preprocessing, 224 input.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from . import layers

Params = Dict[str, Any]

BN_EPS = 0.001
DEFAULT_IMAGE_SIZE = 224
FEATURE_DIM = 1280

# (expansion t, out channels c, repeats n, first stride s) — the V2 table
_IR_TABLE = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _bn(c):
    return {"beta": jnp.zeros((c,), jnp.float32),
            "gamma": jnp.ones((c,), jnp.float32),
            "moving_mean": jnp.zeros((c,), jnp.float32),
            "moving_variance": jnp.ones((c,), jnp.float32)}


def _w(key, shape):
    return layers.slim_variance_scaling(
        key, shape, shape[0] * shape[1] * shape[2])


def _block_names() -> List[str]:
    names = []
    idx = 0
    for t, c, n, s in _IR_TABLE:
        for _ in range(n):
            names.append("expanded_conv" if idx == 0
                         else f"expanded_conv_{idx}")
            idx += 1
    return names


def make_divisible(v: float, divisor: int = 8) -> int:
    """slim conv_blocks._make_divisible: round to the nearest multiple of
    `divisor`, never dropping more than 10% of the value."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def feature_dim(depth_multiplier: float = 1.0) -> int:
    """Final Conv_1 width. For multiplier >= 1 slim scales it like every
    other layer: 1.4 -> 1792. Below 1, finegrain_classification_mode
    keeps Conv_1 at 1280 (mobilenet_v2.py mobilenet()) — published
    sub-1.0 checkpoints all have the unscaled head."""
    if depth_multiplier <= 1.0:
        return FEATURE_DIM
    return make_divisible(FEATURE_DIM * depth_multiplier)


def init_params(key, depth_multiplier: float = 1.0) -> Params:
    """The 1.4 registry variant (mobilenet_v2_140,
    /root/reference/common/net_params.py:85-90) multiplies every channel
    count through make_divisible(c * 1.4, 8); `apply` reads channel counts
    from the param shapes, so only init changes."""
    def depth(c):
        return (c if depth_multiplier == 1.0
                else make_divisible(c * depth_multiplier))

    params: Params = {}
    key, k0 = jax.random.split(key)
    c0 = depth(32)
    params["Conv"] = {"weights": _w(k0, (3, 3, 3, c0)), "BatchNorm": _bn(c0)}
    cin = c0
    idx = 0
    for t, c, n, s in _IR_TABLE:
        for r in range(n):
            name = "expanded_conv" if idx == 0 else f"expanded_conv_{idx}"
            key, ke, kd, kp = jax.random.split(key, 4)
            block: Params = {}
            cout = depth(c)
            # expansion size from the (multiplied) INPUT channels:
            # expand_input_by_factor(6) -> make_divisible(cin * 6, 8)
            mid = cin if t == 1 else make_divisible(cin * t)
            if t != 1:
                block["expand"] = {"weights": _w(ke, (1, 1, cin, mid)),
                                   "BatchNorm": _bn(mid)}
            block["depthwise"] = {
                "depthwise_weights": _w(kd, (3, 3, mid, 1)),
                "BatchNorm": _bn(mid)}
            block["project"] = {"weights": _w(kp, (1, 1, mid, cout)),
                                "BatchNorm": _bn(cout)}
            params[name] = block
            cin = cout
            idx += 1
    key, k1 = jax.random.split(key)
    fdim = feature_dim(depth_multiplier)
    params["Conv_1"] = {"weights": _w(k1, (1, 1, cin, fdim)),
                        "BatchNorm": _bn(fdim)}
    return params


def _conv_bn(p, x, stride, dtype=None, relu6=True, groups=1, kernel=None):
    w = kernel if kernel is not None else p["weights"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups).astype(jnp.float32)
    bn = p["BatchNorm"]
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPS) * bn["gamma"]
    y = (y - bn["moving_mean"]) * inv + bn["beta"]
    return jnp.minimum(jax.nn.relu(y), 6.0) if relu6 else y


def apply(params: Params, images: jnp.ndarray,
          final_endpoint: str = "Conv_1", dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    end_points: Dict[str, jnp.ndarray] = {}
    net = _conv_bn(params["Conv"], images, 2, dtype)
    end_points["Conv"] = net
    idx = 0
    for t, c, n, s in _IR_TABLE:
        for r in range(n):
            name = "expanded_conv" if idx == 0 else f"expanded_conv_{idx}"
            block = params[name]
            stride = s if r == 0 else 1
            x_in = net
            y = net
            if "expand" in block:
                y = _conv_bn(block["expand"], y, 1, dtype)
            mid = y.shape[-1]
            dw = block["depthwise"]["depthwise_weights"]  # (3,3,mid,1)
            kernel = jnp.transpose(dw, (0, 1, 3, 2)).reshape(3, 3, 1, mid)
            y = _conv_bn(block["depthwise"], y, stride, dtype,
                         groups=mid, kernel=kernel)
            y = _conv_bn(block["project"], y, 1, dtype, relu6=False)
            if stride == 1 and x_in.shape[-1] == y.shape[-1]:
                y = x_in + y
            net = y
            end_points[name] = net
            if name == final_endpoint:
                return net, end_points
            idx += 1
    net = _conv_bn(params["Conv_1"], net, 1, dtype)
    end_points["Conv_1"] = net
    return net, end_points


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(net, axis=(1, 2))
