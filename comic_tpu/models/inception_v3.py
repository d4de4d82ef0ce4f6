"""Inception-V3 image encoder in pure JAX.

From-scratch functional implementation of slim's inception_v3
(/root/reference/common/nets/inception_v3.py; selectable via --cnn_name).
The network is expressed as a data table: a VALID-padded stem followed by
SAME-padded inception blocks whose branches are lists of primitive ops.
Parameter keys replicate the slim scope names exactly — including the
Mixed_5c quirks ('Conv2d_0b_1x1', 'Conv_1_0c_5x5') — so ImageNet
checkpoints convert mechanically. BN: scale=False, eps=0.001, inference
mode always (model_base.py:72-76). num_classes=None head = global average
pool -> (B, 2048). Default input 299x299, inception preprocessing.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from . import layers
from .inception_v1 import BN_EPS, _conv_bn_init

Params = Dict[str, Any]

DEFAULT_IMAGE_SIZE = 299
FEATURE_DIM = 2048

# stem: (name, kind, spec) with VALID default padding
#   conv: (cout, (kh, kw), stride, padding)
#   maxpool: (k, stride)
_STEM = [
    ("Conv2d_1a_3x3", "conv", (32, (3, 3), 2, "VALID")),
    ("Conv2d_2a_3x3", "conv", (32, (3, 3), 1, "VALID")),
    ("Conv2d_2b_3x3", "conv", (64, (3, 3), 1, "SAME")),
    ("MaxPool_3a_3x3", "maxpool", (3, 2)),
    ("Conv2d_3b_1x1", "conv", (80, (1, 1), 1, "VALID")),
    ("Conv2d_4a_3x3", "conv", (192, (3, 3), 1, "VALID")),
    ("MaxPool_5a_3x3", "maxpool", (3, 2)),
]

# branch op: ("conv", scope, cout, (kh, kw), stride, padding)
#            ("maxpool"/"avgpool", scope, k, stride, padding)
#            ("fanout", [conv ops])  -- parallel convs on the same input,
#                                       concatenated (Mixed_7b/7c)
def _std_17(inner: int) -> list:
    return [
        [("conv", "Conv2d_0a_1x1", 192, (1, 1), 1, "SAME")],
        [("conv", "Conv2d_0a_1x1", inner, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_1x7", inner, (1, 7), 1, "SAME"),
         ("conv", "Conv2d_0c_7x1", 192, (7, 1), 1, "SAME")],
        [("conv", "Conv2d_0a_1x1", inner, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_7x1", inner, (7, 1), 1, "SAME"),
         ("conv", "Conv2d_0c_1x7", inner, (1, 7), 1, "SAME"),
         ("conv", "Conv2d_0d_7x1", inner, (7, 1), 1, "SAME"),
         ("conv", "Conv2d_0e_1x7", 192, (1, 7), 1, "SAME")],
        [("avgpool", "AvgPool_0a_3x3", 3, 1, "SAME"),
         ("conv", "Conv2d_0b_1x1", 192, (1, 1), 1, "SAME")],
    ]


def _expand_8(first: str) -> list:
    return [
        [("conv", "Conv2d_0a_1x1", 320, (1, 1), 1, "SAME")],
        [("conv", "Conv2d_0a_1x1", 384, (1, 1), 1, "SAME"),
         ("fanout", [("conv", "Conv2d_0b_1x3", 384, (1, 3), 1, "SAME"),
                     ("conv", first, 384, (3, 1), 1, "SAME")])],
        [("conv", "Conv2d_0a_1x1", 448, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_3x3", 384, (3, 3), 1, "SAME"),
         ("fanout", [("conv", "Conv2d_0c_1x3", 384, (1, 3), 1, "SAME"),
                     ("conv", "Conv2d_0d_3x1", 384, (3, 1), 1, "SAME")])],
        [("avgpool", "AvgPool_0a_3x3", 3, 1, "SAME"),
         ("conv", "Conv2d_0b_1x1", 192, (1, 1), 1, "SAME")],
    ]


_MIXED: List[Tuple[str, list]] = [
    ("Mixed_5b", [
        [("conv", "Conv2d_0a_1x1", 64, (1, 1), 1, "SAME")],
        [("conv", "Conv2d_0a_1x1", 48, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_5x5", 64, (5, 5), 1, "SAME")],
        [("conv", "Conv2d_0a_1x1", 64, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_3x3", 96, (3, 3), 1, "SAME"),
         ("conv", "Conv2d_0c_3x3", 96, (3, 3), 1, "SAME")],
        [("avgpool", "AvgPool_0a_3x3", 3, 1, "SAME"),
         ("conv", "Conv2d_0b_1x1", 32, (1, 1), 1, "SAME")],
    ]),
    ("Mixed_5c", [
        [("conv", "Conv2d_0a_1x1", 64, (1, 1), 1, "SAME")],
        # slim's historical scope quirks, kept for checkpoint parity
        [("conv", "Conv2d_0b_1x1", 48, (1, 1), 1, "SAME"),
         ("conv", "Conv_1_0c_5x5", 64, (5, 5), 1, "SAME")],
        [("conv", "Conv2d_0a_1x1", 64, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_3x3", 96, (3, 3), 1, "SAME"),
         ("conv", "Conv2d_0c_3x3", 96, (3, 3), 1, "SAME")],
        [("avgpool", "AvgPool_0a_3x3", 3, 1, "SAME"),
         ("conv", "Conv2d_0b_1x1", 64, (1, 1), 1, "SAME")],
    ]),
    ("Mixed_5d", [
        [("conv", "Conv2d_0a_1x1", 64, (1, 1), 1, "SAME")],
        [("conv", "Conv2d_0a_1x1", 48, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_5x5", 64, (5, 5), 1, "SAME")],
        [("conv", "Conv2d_0a_1x1", 64, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_3x3", 96, (3, 3), 1, "SAME"),
         ("conv", "Conv2d_0c_3x3", 96, (3, 3), 1, "SAME")],
        [("avgpool", "AvgPool_0a_3x3", 3, 1, "SAME"),
         ("conv", "Conv2d_0b_1x1", 64, (1, 1), 1, "SAME")],
    ]),
    ("Mixed_6a", [
        [("conv", "Conv2d_1a_1x1", 384, (3, 3), 2, "VALID")],
        [("conv", "Conv2d_0a_1x1", 64, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_3x3", 96, (3, 3), 1, "SAME"),
         ("conv", "Conv2d_1a_1x1", 96, (3, 3), 2, "VALID")],
        [("maxpool", "MaxPool_1a_3x3", 3, 2, "VALID")],
    ]),
    ("Mixed_6b", _std_17(128)),
    ("Mixed_6c", _std_17(160)),
    ("Mixed_6d", _std_17(160)),
    ("Mixed_6e", _std_17(192)),
    ("Mixed_7a", [
        [("conv", "Conv2d_0a_1x1", 192, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_1a_3x3", 320, (3, 3), 2, "VALID")],
        [("conv", "Conv2d_0a_1x1", 192, (1, 1), 1, "SAME"),
         ("conv", "Conv2d_0b_1x7", 192, (1, 7), 1, "SAME"),
         ("conv", "Conv2d_0c_7x1", 192, (7, 1), 1, "SAME"),
         ("conv", "Conv2d_1a_3x3", 192, (3, 3), 2, "VALID")],
        [("maxpool", "MaxPool_1a_3x3", 3, 2, "VALID")],
    ]),
    ("Mixed_7b", _expand_8("Conv2d_0b_3x1")),
    ("Mixed_7c", _expand_8("Conv2d_0c_3x1")),
]


def _conv(p, x, kh_kw, stride, padding, dtype=None):
    w = p["weights"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    bn = p["BatchNorm"]
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPS)
    return jax.nn.relu((y - bn["moving_mean"]) * inv + bn["beta"])


def _pool(x, k, stride, padding, kind):
    if kind == "maxpool":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, k, k, 1),
            (1, stride, stride, 1), padding)
    return layers.avg_pool_same(x, k, stride, padding)


def _conv_init_hw(key, kh, kw, cin, cout):
    p = _conv_bn_init(key, 1, cin, cout)
    p["weights"] = layers.slim_variance_scaling(
        key, (kh, kw, cin, cout), kh * kw * cin)
    return p


def _branch_out_channels(ops, cin):
    c = cin
    for op in ops:
        if op[0] == "conv":
            c = op[2]
        elif op[0] == "fanout":
            c = sum(sub[2] for sub in op[1])
    return c


def init_params(key) -> Params:
    params: Params = {}
    cin = 3
    for name, kind, spec in _STEM:
        if kind == "conv":
            cout, (kh, kw), _, _ = spec
            key, sub = jax.random.split(key)
            params[name] = _conv_init_hw(sub, kh, kw, cin, cout)
            cin = cout
    for name, branches in _MIXED:
        block: Params = {}
        total = 0
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
            total += _branch_out_channels(ops, cin)
        params[name] = block
        cin = total
    return params


def _apply_branch_ops(bp, y, ops, dtype):
    for op in ops:
        if op[0] == "conv":
            _, scope, cout, kh_kw, stride, padding = op
            y = _conv(bp[scope], y, kh_kw, stride, padding, dtype)
        elif op[0] == "fanout":
            parts = [_conv(bp[s[1]], y, s[3], s[4], s[5], dtype)
                     for s in op[1]]
            y = jnp.concatenate(parts, axis=3)
        else:
            kind, scope, k, stride, padding = op
            y = _pool(y, k, stride, padding, kind)
    return y


def apply_mixed_block(block_params: Params, branches, net, dtype,
                      merge_1x1: bool = False):
    """Apply one table-driven inception mixed block. Shared by inception
    v3 and v4 (slim inception_v3.py:108-494, inception_v4.py:47-225).

    merge_1x1=True fuses the input-side 1x1 convs of every branch that
    starts with one into a single conv (layers.merged_1x1_bn_relu).
    MEASURED NEGATIVE for v3/v4 and left OFF here: best-of-2 on the real
    chip (tools/merge_zoo_probe.py, b64 bf16) reads v3 12.92 -> 13.44 ms
    (0.96x) and v4 21.22 -> 21.61 ms (0.98x) merged — their wide
    factorized tails (7x1/1x7 fanouts) already fill the MXU and the
    merge's extra split/concat costs more than the lane padding it
    saves. The same transform WINS on v1 (1.109x), v2 (1.06-1.08x) and
    inception_resnet_v2 (1.14x), where it stays on."""
    merge = [bi for bi, ops in enumerate(branches)
             if ops[0][0] == "conv" and ops[0][3] == (1, 1)
             and ops[0][4] == 1 and ops[0][5] == "SAME"] if merge_1x1 \
        else []
    firsts = {}
    if len(merge) >= 2:
        parts = [block_params[f"Branch_{bi}"][branches[bi][0][1]]
                 for bi in merge]
        firsts = dict(zip(
            merge, layers.merged_1x1_bn_relu(parts, net, BN_EPS, dtype)))
    outs = []
    for bi, ops in enumerate(branches):
        bp = block_params[f"Branch_{bi}"]
        if bi in firsts:
            outs.append(_apply_branch_ops(bp, firsts[bi], ops[1:], dtype))
        else:
            outs.append(_apply_branch_ops(bp, net, ops, dtype))
    return jnp.concatenate(outs, axis=3)


def apply(params: Params, images: jnp.ndarray,
          final_endpoint: str = "Mixed_7c", dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    end_points: Dict[str, jnp.ndarray] = {}
    net = images
    for name, kind, spec in _STEM:
        if kind == "conv":
            cout, kh_kw, stride, padding = spec
            net = _conv(params[name], net, kh_kw, stride, padding, dtype)
        else:
            k, stride = spec
            net = _pool(net, k, stride, "VALID", "maxpool")
        end_points[name] = net
        if name == final_endpoint:
            return net, end_points
    for name, branches in _MIXED:
        net = apply_mixed_block(params[name], branches, net, dtype)
        end_points[name] = net
        if name == final_endpoint:
            return net, end_points
    return net, end_points


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(net, axis=(1, 2))
