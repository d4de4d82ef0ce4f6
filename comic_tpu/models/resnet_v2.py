"""ResNet-v2 (preactivation) image encoders in pure JAX.

From-scratch functional implementation of slim's resnet_v2 family
(/root/reference/common/nets/resnet_v2.py; selectable via --cnn_name).
Differences from v1 (resnet.py): each bottleneck BN+relu-preactivates its
input; the shortcut projects from the PREACTIVATED tensor; conv3 has a bias
and no BN; the root conv has no BN/relu; a final 'postnorm' BN+relu follows
block4. Param keys mirror the slim layout (preact/, conv3/biases,
postnorm/). BN scale=True eps=1e-5, inference mode always. VGG-style
preprocessing; pooled feature dim 2048.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .resnet import (RESNET_V1_UNITS, _BLOCK_DEPTHS, BN_EPS, _conv_init,
                     _same_pad)

Params = Dict[str, Any]

RESNET_V2_UNITS = {f"resnet_v2_{n.split('_')[-1]}": u
                   for n, u in RESNET_V1_UNITS.items()}
DEFAULT_IMAGE_SIZE = 224
FEATURE_DIM = 2048


def _bn_params(c):
    return {"beta": jnp.zeros((c,), jnp.float32),
            "gamma": jnp.ones((c,), jnp.float32),
            "moving_mean": jnp.zeros((c,), jnp.float32),
            "moving_variance": jnp.ones((c,), jnp.float32)}


def _bn_relu(bn, x):
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPS) * bn["gamma"]
    return jax.nn.relu((x - bn["moving_mean"]) * inv + bn["beta"])


def _conv(w, x, stride, dtype=None, bias=None):
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), _same_pad(w.shape[0], stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    if bias is not None:
        y = y + bias
    return y


def init_params(key, name: str = "resnet_v2_50") -> Params:
    units = RESNET_V2_UNITS[name]
    params: Params = {}
    key, sub = jax.random.split(key)
    # root conv: no BN (preact nets normalize inside units), with bias
    root = _conv_init(sub, 7, 3, 64)
    params["conv1"] = {"weights": root["weights"],
                       "biases": jnp.zeros((64,), jnp.float32)}
    cin = 64
    for bi, (n_units, depth) in enumerate(zip(units, _BLOCK_DEPTHS), 1):
        block: Params = {}
        cout = depth * 4
        for ui in range(1, n_units + 1):
            key, *ks = jax.random.split(key, 5)
            unit: Params = {
                "preact": _bn_params(cin),
                "conv1": _conv_init(ks[0], 1, cin, depth),
                "conv2": _conv_init(ks[1], 3, depth, depth),
                "conv3": {"weights": _conv_init(ks[2], 1, depth, cout)["weights"],
                          "biases": jnp.zeros((cout,), jnp.float32)},
            }
            if cin != cout:
                unit["shortcut"] = {
                    "weights": _conv_init(ks[3], 1, cin, cout)["weights"],
                    "biases": jnp.zeros((cout,), jnp.float32)}
            block[f"unit_{ui}"] = {"bottleneck_v2": unit}
            cin = cout
        params[f"block{bi}"] = block
    params["postnorm"] = _bn_params(cin)
    return params


def _conv_bn_relu(p, x, stride, dtype=None):
    y = _conv(p["weights"], x, stride, dtype)
    return _bn_relu(p["BatchNorm"], y)


def _bottleneck_v2(p: Params, x: jnp.ndarray, stride: int, dtype=None
                   ) -> jnp.ndarray:
    preact = _bn_relu(p["preact"], x)
    if "shortcut" in p:
        shortcut = _conv(p["shortcut"]["weights"], preact, stride, dtype,
                         p["shortcut"]["biases"])
    elif stride > 1:
        shortcut = x[:, ::stride, ::stride, :]
    else:
        shortcut = x
    y = _conv_bn_relu(p["conv1"], preact, 1, dtype)
    y = _conv_bn_relu(p["conv2"], y, stride, dtype)
    y = _conv(p["conv3"]["weights"], y, 1, dtype, p["conv3"]["biases"])
    return shortcut + y


def apply(params: Params, images: jnp.ndarray, name: str = "resnet_v2_50",
          final_endpoint: str = "postnorm", dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    units = RESNET_V2_UNITS[name]
    end_points: Dict[str, jnp.ndarray] = {}
    net = _conv(params["conv1"]["weights"], images, 2, dtype,
                params["conv1"]["biases"])
    end_points["conv1"] = net
    net = jax.lax.reduce_window(net, -jnp.inf, jax.lax.max,
                                (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
    end_points["pool1"] = net
    for bi, n_units in enumerate(units, 1):
        bname = f"block{bi}"
        for ui in range(1, n_units + 1):
            stride = 2 if (ui == n_units and bi < 4) else 1
            net = _bottleneck_v2(params[bname][f"unit_{ui}"]["bottleneck_v2"],
                                 net, stride, dtype)
        end_points[bname] = net
        if bname == final_endpoint:
            return net, end_points
    net = _bn_relu(params["postnorm"], net)
    end_points["postnorm"] = net
    return net, end_points


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(net, axis=(1, 2))
