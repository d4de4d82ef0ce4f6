"""Inception-ResNet-V2 image encoder in pure JAX.

From-scratch functional implementation of slim's inception_resnet_v2
(/root/reference/common/nets/inception_resnet_v2.py:33-307; selectable via
--cnn_name, registered in nets_factory.py + net_params.py). The three
residual block types are table-driven; parameter keys mirror the slim
variable layout (Repeat/block35_{i}, Repeat_1/block17_{i},
Repeat_2/block8_{i}, Block8, Mixed_{5b,6a,7a}, stem convs) so slim ImageNet
checkpoints convert mechanically (utils/tf_checkpoint.py).

Slim semantics preserved (output_stride=16, align_feature_maps=False):
  - stem uses VALID padding on the strided/3x3 convs and pools
    (inception_resnet_v2.py:149-187); everything else SAME;
  - residual blocks: branches (conv+BN+relu) -> concat -> 1x1 linear conv
    WITH bias and NO BatchNorm (normalizer_fn=None) -> scale -> add -> relu
    (:33-107); the final Block8 applies no activation (:281-282);
  - BN: scale=False, center=True, eps=0.001, inference mode ALWAYS (the
    reference builds every encoder with is_training=False,
    model_base.py:72-76);
  - num_classes=None head = Conv2d_7b_1x1 (1536) + global average pool.

299x299 input -> Mixed_5b 35x35x320 -> (10x block35, scale .17)
-> Mixed_6a 17x17x1088 -> (20x block17, scale .10) = PreAuxLogits
-> Mixed_7a 8x8x2080 -> (9x block8, scale .20) -> Block8 (no act)
-> Conv2d_7b_1x1 8x8x1536. Inception preprocessing ([-1, 1]).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from . import layers

Params = Dict[str, Any]

BN_EPS = 0.001
DEFAULT_IMAGE_SIZE = 299
FEATURE_DIM = 1536


def _truncated_normal_scaled(key, shape, dtype=jnp.float32):
    return layers.slim_variance_scaling(
        key, shape, shape[0] * shape[1] * shape[2], dtype)


def _conv_bn_init(key, kh, kw, cin, cout) -> Params:
    return {
        "weights": _truncated_normal_scaled(key, (kh, kw, cin, cout)),
        "BatchNorm": {
            "beta": jnp.zeros((cout,), jnp.float32),
            "moving_mean": jnp.zeros((cout,), jnp.float32),
            "moving_variance": jnp.ones((cout,), jnp.float32),
        },
    }


def _conv_bias_init(key, kh, kw, cin, cout) -> Params:
    """The residual up-projection: linear 1x1 conv, bias, no BN."""
    return {
        "weights": _truncated_normal_scaled(key, (kh, kw, cin, cout)),
        "biases": jnp.zeros((cout,), jnp.float32),
    }


def _conv_bn_relu(p, x, stride=1, padding="SAME", dtype=None, relu=True):
    w = p["weights"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    bn = p["BatchNorm"]
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPS)
    y = (y - bn["moving_mean"]) * inv + bn["beta"]
    return jax.nn.relu(y) if relu else y


def _conv_linear(p, x, dtype=None):
    w = p["weights"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    return y + p["biases"]


def _max_pool(x, k, stride, padding="SAME"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, stride, stride, 1),
                                 padding)


def _avg_pool_same(x, k):
    return layers.avg_pool_same(x, k, 1, "SAME")


# residual block tables: (branch name, [(conv name, kh, kw, cout), ...])
# (inception_resnet_v2.py:33-107)
_BLOCK35 = [
    ("Branch_0", [("Conv2d_1x1", 1, 1, 32)]),
    ("Branch_1", [("Conv2d_0a_1x1", 1, 1, 32), ("Conv2d_0b_3x3", 3, 3, 32)]),
    ("Branch_2", [("Conv2d_0a_1x1", 1, 1, 32), ("Conv2d_0b_3x3", 3, 3, 48),
                  ("Conv2d_0c_3x3", 3, 3, 64)]),
]
_BLOCK17 = [
    ("Branch_0", [("Conv2d_1x1", 1, 1, 192)]),
    ("Branch_1", [("Conv2d_0a_1x1", 1, 1, 128), ("Conv2d_0b_1x7", 1, 7, 160),
                  ("Conv2d_0c_7x1", 7, 1, 192)]),
]
_BLOCK8 = [
    ("Branch_0", [("Conv2d_1x1", 1, 1, 192)]),
    ("Branch_1", [("Conv2d_0a_1x1", 1, 1, 192), ("Conv2d_0b_1x3", 1, 3, 224),
                  ("Conv2d_0c_3x1", 3, 1, 256)]),
]

# (block table, input channels, repeat count, residual scale)
_REPEATS = [
    ("Repeat", _BLOCK35, "block35", 320, 10, 0.17),
    ("Repeat_1", _BLOCK17, "block17", 1088, 20, 0.10),
    ("Repeat_2", _BLOCK8, "block8", 2080, 9, 0.20),
]


def _res_block_init(key, table, cin) -> Params:
    p: Params = {}
    concat = 0
    for bname, convs in table:
        branch: Params = {}
        c = cin
        for cname, kh, kw, cout in convs:
            key, sub = jax.random.split(key)
            branch[cname] = _conv_bn_init(sub, kh, kw, c, cout)
            c = cout
        concat += c
        p[bname] = branch
    key, sub = jax.random.split(key)
    p["Conv2d_1x1"] = _conv_bias_init(sub, 1, 1, concat, cin)
    return p


def _res_block_apply(p, table, x, scale, dtype=None, relu=True):
    # every branch in the _BLOCK* tables starts with a 1x1 conv over x;
    # they are merged into one MXU-filling conv (see
    # layers.merged_1x1_bn_relu for the exactness argument)
    firsts = layers.merged_1x1_bn_relu(
        [p[bname][convs[0][0]] for bname, convs in table], x, BN_EPS,
        dtype)
    branches = []
    for (bname, convs), y in zip(table, firsts):
        for cname, _, _, _ in convs[1:]:
            y = _conv_bn_relu(p[bname][cname], y, dtype=dtype)
        branches.append(y)
    mixed = jnp.concatenate(branches, axis=3)
    up = _conv_linear(p["Conv2d_1x1"], mixed, dtype=dtype)
    y = x + scale * up
    return jax.nn.relu(y) if relu else y


def init_params(key) -> Params:
    params: Params = {}
    # stem (inception_resnet_v2.py:161-187)
    stem = [("Conv2d_1a_3x3", 3, 3, 3, 32), ("Conv2d_2a_3x3", 3, 3, 32, 32),
            ("Conv2d_2b_3x3", 3, 3, 32, 64), ("Conv2d_3b_1x1", 1, 1, 64, 80),
            ("Conv2d_4a_3x3", 3, 3, 80, 192)]
    for name, kh, kw, cin, cout in stem:
        key, sub = jax.random.split(key)
        params[name] = _conv_bn_init(sub, kh, kw, cin, cout)

    # Mixed_5b (:190-210): 96 + 64 + 96 + 64 = 320
    ks = jax.random.split(key, 9)
    key = ks[0]
    params["Mixed_5b"] = {
        "Branch_0": {"Conv2d_1x1": _conv_bn_init(ks[1], 1, 1, 192, 96)},
        "Branch_1": {"Conv2d_0a_1x1": _conv_bn_init(ks[2], 1, 1, 192, 48),
                     "Conv2d_0b_5x5": _conv_bn_init(ks[3], 5, 5, 48, 64)},
        "Branch_2": {"Conv2d_0a_1x1": _conv_bn_init(ks[4], 1, 1, 192, 64),
                     "Conv2d_0b_3x3": _conv_bn_init(ks[5], 3, 3, 64, 96),
                     "Conv2d_0c_3x3": _conv_bn_init(ks[6], 3, 3, 96, 96)},
        "Branch_3": {"Conv2d_0b_1x1": _conv_bn_init(ks[7], 1, 1, 192, 64)},
    }

    for rname, table, bname, cin, n, _ in _REPEATS:
        rep: Params = {}
        for i in range(1, n + 1):
            key, sub = jax.random.split(key)
            rep[f"{bname}_{i}"] = _res_block_init(sub, table, cin)
        params[rname] = rep
        if rname == "Repeat":
            # Mixed_6a (:220-237): 384 + 384 + 320(pool) = 1088
            ks = jax.random.split(key, 5)
            key = ks[0]
            params["Mixed_6a"] = {
                "Branch_0": {"Conv2d_1a_3x3": _conv_bn_init(ks[1], 3, 3, 320,
                                                            384)},
                "Branch_1": {
                    "Conv2d_0a_1x1": _conv_bn_init(ks[2], 1, 1, 320, 256),
                    "Conv2d_0b_3x3": _conv_bn_init(ks[3], 3, 3, 256, 256),
                    "Conv2d_1a_3x3": _conv_bn_init(ks[4], 3, 3, 256, 384)},
                "Branch_2": {},  # max pool, no params
            }
        elif rname == "Repeat_1":
            # Mixed_7a (:253-276): 384 + 288 + 320 + 1088(pool) = 2080
            ks = jax.random.split(key, 8)
            key = ks[0]
            params["Mixed_7a"] = {
                "Branch_0": {
                    "Conv2d_0a_1x1": _conv_bn_init(ks[1], 1, 1, 1088, 256),
                    "Conv2d_1a_3x3": _conv_bn_init(ks[2], 3, 3, 256, 384)},
                "Branch_1": {
                    "Conv2d_0a_1x1": _conv_bn_init(ks[3], 1, 1, 1088, 256),
                    "Conv2d_1a_3x3": _conv_bn_init(ks[4], 3, 3, 256, 288)},
                "Branch_2": {
                    "Conv2d_0a_1x1": _conv_bn_init(ks[5], 1, 1, 1088, 256),
                    "Conv2d_0b_3x3": _conv_bn_init(ks[6], 3, 3, 256, 288),
                    "Conv2d_1a_3x3": _conv_bn_init(ks[7], 3, 3, 288, 320)},
                "Branch_3": {},  # max pool, no params
            }

    # final standalone Block8 (no activation) + Conv2d_7b_1x1 (:281-286)
    key, k1, k2 = jax.random.split(key, 3)
    params["Block8"] = _res_block_init(k1, _BLOCK8, 2080)
    params["Conv2d_7b_1x1"] = _conv_bn_init(k2, 1, 1, 2080, 1536)
    return params


def apply(params: Params, images: jnp.ndarray,
          final_endpoint: str = "Conv2d_7b_1x1", dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Run the base network (output_stride=16, VALID stem) up to
    `final_endpoint` (inception_resnet_v2.py:111-290)."""
    ep: Dict[str, jnp.ndarray] = {}

    def done(name, net):
        ep[name] = net
        return name == final_endpoint

    net = _conv_bn_relu(params["Conv2d_1a_3x3"], images, 2, "VALID", dtype)
    if done("Conv2d_1a_3x3", net):
        return net, ep
    net = _conv_bn_relu(params["Conv2d_2a_3x3"], net, 1, "VALID", dtype)
    if done("Conv2d_2a_3x3", net):
        return net, ep
    net = _conv_bn_relu(params["Conv2d_2b_3x3"], net, 1, "SAME", dtype)
    if done("Conv2d_2b_3x3", net):
        return net, ep
    net = _max_pool(net, 3, 2, "VALID")
    if done("MaxPool_3a_3x3", net):
        return net, ep
    net = _conv_bn_relu(params["Conv2d_3b_1x1"], net, 1, "VALID", dtype)
    if done("Conv2d_3b_1x1", net):
        return net, ep
    net = _conv_bn_relu(params["Conv2d_4a_3x3"], net, 1, "VALID", dtype)
    if done("Conv2d_4a_3x3", net):
        return net, ep
    net = _max_pool(net, 3, 2, "VALID")
    if done("MaxPool_5a_3x3", net):
        return net, ep

    # Mixed_5b (input-side 1x1s merged — layers.merged_1x1_bn_relu)
    p = params["Mixed_5b"]
    b0, b1, b2 = layers.merged_1x1_bn_relu(
        [p["Branch_0"]["Conv2d_1x1"], p["Branch_1"]["Conv2d_0a_1x1"],
         p["Branch_2"]["Conv2d_0a_1x1"]], net, BN_EPS, dtype)
    b1 = _conv_bn_relu(p["Branch_1"]["Conv2d_0b_5x5"], b1, dtype=dtype)
    b2 = _conv_bn_relu(p["Branch_2"]["Conv2d_0b_3x3"], b2, dtype=dtype)
    b2 = _conv_bn_relu(p["Branch_2"]["Conv2d_0c_3x3"], b2, dtype=dtype)
    b3 = _avg_pool_same(net, 3)
    b3 = _conv_bn_relu(p["Branch_3"]["Conv2d_0b_1x1"], b3, dtype=dtype)
    net = jnp.concatenate([b0, b1, b2, b3], axis=3)
    if done("Mixed_5b", net):
        return net, ep

    for i in range(1, 11):
        net = _res_block_apply(params["Repeat"][f"block35_{i}"], _BLOCK35,
                               net, 0.17, dtype)

    # Mixed_6a
    p = params["Mixed_6a"]
    b0 = _conv_bn_relu(p["Branch_0"]["Conv2d_1a_3x3"], net, 2, "VALID",
                       dtype)
    b1 = _conv_bn_relu(p["Branch_1"]["Conv2d_0a_1x1"], net, dtype=dtype)
    b1 = _conv_bn_relu(p["Branch_1"]["Conv2d_0b_3x3"], b1, dtype=dtype)
    b1 = _conv_bn_relu(p["Branch_1"]["Conv2d_1a_3x3"], b1, 2, "VALID", dtype)
    b2 = _max_pool(net, 3, 2, "VALID")
    net = jnp.concatenate([b0, b1, b2], axis=3)
    if done("Mixed_6a", net):
        return net, ep

    for i in range(1, 21):
        net = _res_block_apply(params["Repeat_1"][f"block17_{i}"], _BLOCK17,
                               net, 0.10, dtype)
    if done("PreAuxLogits", net):
        return net, ep

    # Mixed_7a (input-side 1x1s merged — layers.merged_1x1_bn_relu)
    p = params["Mixed_7a"]
    b0, b1, b2 = layers.merged_1x1_bn_relu(
        [p["Branch_0"]["Conv2d_0a_1x1"], p["Branch_1"]["Conv2d_0a_1x1"],
         p["Branch_2"]["Conv2d_0a_1x1"]], net, BN_EPS, dtype)
    b0 = _conv_bn_relu(p["Branch_0"]["Conv2d_1a_3x3"], b0, 2, "VALID", dtype)
    b1 = _conv_bn_relu(p["Branch_1"]["Conv2d_1a_3x3"], b1, 2, "VALID", dtype)
    b2 = _conv_bn_relu(p["Branch_2"]["Conv2d_0b_3x3"], b2, dtype=dtype)
    b2 = _conv_bn_relu(p["Branch_2"]["Conv2d_1a_3x3"], b2, 2, "VALID", dtype)
    b3 = _max_pool(net, 3, 2, "VALID")
    net = jnp.concatenate([b0, b1, b2, b3], axis=3)
    if done("Mixed_7a", net):
        return net, ep

    for i in range(1, 10):
        net = _res_block_apply(params["Repeat_2"][f"block8_{i}"], _BLOCK8,
                               net, 0.20, dtype)
    net = _res_block_apply(params["Block8"], _BLOCK8, net, 1.0, dtype,
                           relu=False)
    net = _conv_bn_relu(params["Conv2d_7b_1x1"], net, dtype=dtype)
    if done("Conv2d_7b_1x1", net):
        return net, ep
    raise ValueError(f"Unknown final endpoint {final_endpoint}")


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    """num_classes=None head: global average pool -> (B, 1536)."""
    return jnp.mean(net, axis=(1, 2))
