"""Inception-V4 image encoder in pure JAX.

From-scratch functional implementation of slim's inception_v4
(/root/reference/common/nets/inception_v4.py; selectable via --cnn_name).
Table-driven like inception_v3: a VALID-heavy stem (with the two branching
stem blocks Mixed_3a/4a/5a), 4x inception-A, reduction-A, 7x inception-B,
reduction-B, 3x inception-C. Param keys mirror slim scope names. BN
scale=False eps=0.001, inference mode always. num_classes=None head =
global average pool -> (B, 1536). Default input 299x299, inception
preprocessing.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .inception_v3 import _conv, _conv_init_hw, apply_mixed_block

Params = Dict[str, Any]

DEFAULT_IMAGE_SIZE = 299
FEATURE_DIM = 1536

_S = "SAME"
_V = "VALID"


def _c(scope, cout, kh, kw, stride=1, padding=_S):
    return ("conv", scope, cout, (kh, kw), stride, padding)


_BLOCK_A = [
    [_c("Conv2d_0a_1x1", 96, 1, 1)],
    [_c("Conv2d_0a_1x1", 64, 1, 1), _c("Conv2d_0b_3x3", 96, 3, 3)],
    [_c("Conv2d_0a_1x1", 64, 1, 1), _c("Conv2d_0b_3x3", 96, 3, 3),
     _c("Conv2d_0c_3x3", 96, 3, 3)],
    [("avgpool", "AvgPool_0a_3x3", 3, 1, _S), _c("Conv2d_0b_1x1", 96, 1, 1)],
]
_REDUCTION_A = [
    [_c("Conv2d_1a_3x3", 384, 3, 3, 2, _V)],
    [_c("Conv2d_0a_1x1", 192, 1, 1), _c("Conv2d_0b_3x3", 224, 3, 3),
     _c("Conv2d_1a_3x3", 256, 3, 3, 2, _V)],
    [("maxpool", "MaxPool_1a_3x3", 3, 2, _V)],
]
_BLOCK_B = [
    [_c("Conv2d_0a_1x1", 384, 1, 1)],
    [_c("Conv2d_0a_1x1", 192, 1, 1), _c("Conv2d_0b_1x7", 224, 1, 7),
     _c("Conv2d_0c_7x1", 256, 7, 1)],
    [_c("Conv2d_0a_1x1", 192, 1, 1), _c("Conv2d_0b_7x1", 192, 7, 1),
     _c("Conv2d_0c_1x7", 224, 1, 7), _c("Conv2d_0d_7x1", 224, 7, 1),
     _c("Conv2d_0e_1x7", 256, 1, 7)],
    [("avgpool", "AvgPool_0a_3x3", 3, 1, _S), _c("Conv2d_0b_1x1", 128, 1, 1)],
]
_REDUCTION_B = [
    [_c("Conv2d_0a_1x1", 192, 1, 1), _c("Conv2d_1a_3x3", 192, 3, 3, 2, _V)],
    [_c("Conv2d_0a_1x1", 256, 1, 1), _c("Conv2d_0b_1x7", 256, 1, 7),
     _c("Conv2d_0c_7x1", 320, 7, 1), _c("Conv2d_1a_3x3", 320, 3, 3, 2, _V)],
    [("maxpool", "MaxPool_1a_3x3", 3, 2, _V)],
]
_BLOCK_C = [
    [_c("Conv2d_0a_1x1", 256, 1, 1)],
    [_c("Conv2d_0a_1x1", 384, 1, 1),
     ("fanout", [_c("Conv2d_0b_1x3", 256, 1, 3),
                 _c("Conv2d_0c_3x1", 256, 3, 1)])],
    [_c("Conv2d_0a_1x1", 384, 1, 1), _c("Conv2d_0b_3x1", 448, 3, 1),
     _c("Conv2d_0c_1x3", 512, 1, 3),
     ("fanout", [_c("Conv2d_0d_1x3", 256, 1, 3),
                 _c("Conv2d_0e_3x1", 256, 3, 1)])],
    [("avgpool", "AvgPool_0a_3x3", 3, 1, _S), _c("Conv2d_0b_1x1", 256, 1, 1)],
]

# stem branching blocks
_MIXED_3A = [
    [("maxpool", "MaxPool_0a_3x3", 3, 2, _V)],
    [_c("Conv2d_0a_3x3", 96, 3, 3, 2, _V)],
]
_MIXED_4A = [
    [_c("Conv2d_0a_1x1", 64, 1, 1), _c("Conv2d_1a_3x3", 96, 3, 3, 1, _V)],
    [_c("Conv2d_0a_1x1", 64, 1, 1), _c("Conv2d_0b_1x7", 64, 1, 7),
     _c("Conv2d_0c_7x1", 64, 7, 1), _c("Conv2d_1a_3x3", 96, 3, 3, 1, _V)],
]
_MIXED_5A = [
    [_c("Conv2d_1a_3x3", 192, 3, 3, 2, _V)],
    [("maxpool", "MaxPool_1a_3x3", 3, 2, _V)],
]


def _blocks() -> List[Tuple[str, list]]:
    out = [("Mixed_3a", _MIXED_3A), ("Mixed_4a", _MIXED_4A),
           ("Mixed_5a", _MIXED_5A)]
    for i in range(4):
        out.append((f"Mixed_5{chr(ord('b') + i)}", _BLOCK_A))
    out.append(("Mixed_6a", _REDUCTION_A))
    for i in range(7):
        out.append((f"Mixed_6{chr(ord('b') + i)}", _BLOCK_B))
    out.append(("Mixed_7a", _REDUCTION_B))
    for i in range(3):
        out.append((f"Mixed_7{chr(ord('b') + i)}", _BLOCK_C))
    return out


_STEM = [
    ("Conv2d_1a_3x3", 32, 3, 2, _V),
    ("Conv2d_2a_3x3", 32, 3, 1, _V),
    ("Conv2d_2b_3x3", 64, 3, 1, _S),
]


def init_params(key) -> Params:
    params: Params = {}
    cin = 3
    for name, cout, k, _, _pad in _STEM:
        key, sub = jax.random.split(key)
        params[name] = _conv_init_hw(sub, k, k, cin, cout)
        cin = cout
    for name, branches in _blocks():
        block: Params = {}
        for bi, ops in enumerate(branches):
            bp: Params = {}
            c = cin
            for op in ops:
                if op[0] == "conv":
                    _, scope, cout, (kh, kw), _, _ = op
                    key, sub = jax.random.split(key)
                    bp[scope] = _conv_init_hw(sub, kh, kw, c, cout)
                    c = cout
                elif op[0] == "fanout":
                    cs = 0
                    for sub_op in op[1]:
                        _, scope, cout, (kh, kw), _, _ = sub_op
                        key, sub = jax.random.split(key)
                        bp[scope] = _conv_init_hw(sub, kh, kw, c, cout)
                        cs += cout
                    c = cs
            block[f"Branch_{bi}"] = bp
        params[name] = block
        # block output channels = sum of branch outputs (pool-only branches
        # pass cin through)
        total = 0
        for ops in branches:
            c = cin
            for op in ops:
                if op[0] == "conv":
                    c = op[2]
                elif op[0] == "fanout":
                    c = sum(s[2] for s in op[1])
            total += c
        cin = total
    return params


def apply(params: Params, images: jnp.ndarray,
          final_endpoint: str = "Mixed_7d", dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    end_points: Dict[str, jnp.ndarray] = {}
    net = images
    for name, cout, k, stride, padding in _STEM:
        net = _conv(params[name], net, (k, k), stride, padding, dtype)
        end_points[name] = net
        if name == final_endpoint:
            return net, end_points
    for name, branches in _blocks():
        net = apply_mixed_block(params[name], branches, net, dtype)
        end_points[name] = net
        if name == final_endpoint:
            return net, end_points
    # slim's inception_v4 raises for unknown endpoints; silently
    # returning the last block's output would hand the attention the
    # wrong feature map
    raise ValueError(f"Unknown inception_v4 endpoint {final_endpoint!r}")


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(net, axis=(1, 2))
