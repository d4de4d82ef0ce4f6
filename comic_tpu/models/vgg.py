"""VGG-16/19 image encoders in pure JAX.

From-scratch functional implementation of slim's vgg family
(/root/reference/common/nets/vgg.py; selectable via --cnn_name). Parameter
layout mirrors slim (conv{i}/conv{i}_{j}/{weights,biases}; fc6/fc7 as
convolutions) for checkpoint conversion. No batch norm — plain conv+bias+
relu. num_classes=None head = fc7 features globally pooled -> (B, 4096).
Inputs use VGG preprocessing (mean-subtracted 0-255 RGB).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

VGG_LAYERS = {
    "vgg_16": (2, 2, 3, 3, 3),
    "vgg_19": (2, 2, 4, 4, 4),
}
_WIDTHS = (64, 128, 256, 512, 512)
DEFAULT_IMAGE_SIZE = 224
FEATURE_DIM = 4096


def _conv_init(key, k, cin, cout):
    limit = jnp.sqrt(6.0 / (k * k * cin + k * k * cout))
    return {
        "weights": jax.random.uniform(key, (k, k, cin, cout), jnp.float32,
                                      -limit, limit),
        "biases": jnp.zeros((cout,), jnp.float32),
    }


def _conv(p, x, stride=1, padding="SAME", dtype=None, relu=True):
    w = p["weights"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")
    ).astype(jnp.float32) + p["biases"]
    return jax.nn.relu(y) if relu else y


def init_params(key, name: str = "vgg_16") -> Params:
    layers = VGG_LAYERS[name]
    params: Params = {}
    cin = 3
    for bi, (n, width) in enumerate(zip(layers, _WIDTHS), 1):
        block: Params = {}
        for li in range(1, n + 1):
            key, sub = jax.random.split(key)
            block[f"conv{bi}_{li}"] = _conv_init(sub, 3, cin, width)
            cin = width
        params[f"conv{bi}"] = block
    key, k6, k7 = jax.random.split(key, 3)
    params["fc6"] = _conv_init(k6, 7, 512, 4096)
    params["fc7"] = _conv_init(k7, 1, 4096, 4096)
    return params


def apply(params: Params, images: jnp.ndarray, name: str = "vgg_16",
          final_endpoint: str = "fc7", dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    layers = VGG_LAYERS[name]
    valid = {f"conv{bi}_{li}" for bi, n in enumerate(layers, 1)
             for li in range(1, n + 1)}
    valid |= {f"pool{bi}" for bi in range(1, len(layers) + 1)}
    valid |= {"fc6", "fc7"}
    if final_endpoint not in valid:
        # slim raises for unknown endpoints too — silently returning fc7
        # would hand the caller the wrong layer's features
        raise ValueError(f"Unknown {name} endpoint {final_endpoint!r}")
    end_points: Dict[str, jnp.ndarray] = {}
    net = images
    for bi, n in enumerate(layers, 1):
        for li in range(1, n + 1):
            ep = f"conv{bi}_{li}"
            net = _conv(params[f"conv{bi}"][ep], net, dtype=dtype)
            end_points[ep] = net
            if ep == final_endpoint:
                return net, end_points
        net = jax.lax.reduce_window(net, -jnp.inf, jax.lax.max,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        end_points[f"pool{bi}"] = net
        if f"pool{bi}" == final_endpoint:
            return net, end_points
    # fc6 is a 7x7 VALID conv in slim; global_pool handles other sizes
    net = _conv(params["fc6"], net, padding="VALID", dtype=dtype)
    end_points["fc6"] = net
    if final_endpoint == "fc6":
        return net, end_points
    net = _conv(params["fc7"], net, dtype=dtype)
    end_points["fc7"] = net
    return net, end_points


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(net, axis=(1, 2))
