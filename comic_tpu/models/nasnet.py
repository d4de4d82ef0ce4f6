"""NASNet-A and PNASNet-5 image encoders in pure JAX.

From-scratch functional implementation of the slim nasnet family
(/root/reference/common/nets/nasnet/{nasnet,nasnet_utils,pnasnet}.py;
selectable via --cnn_name through nets_factory.py:71-75). Four variants:
nasnet_mobile / nasnet_large / pnasnet_mobile / pnasnet_large.

The cell program is data: each NASNet-A cell combines 5 pairs of hidden
states with predicted operations (stacked separable convs, 3x3 pools,
identity) and concatenates the unused states (nasnet_utils.py:246-421).
Because the hidden-state graph is dynamic (channels/spatial depend on
position), parameters are managed by a tiny scope-path store: `init_params`
traces the forward once under `jax.eval_shape` to collect (path, spec)
pairs — no FLOPs — then materializes the pytree; `apply` re-runs the same
trace fetching parameters by path. Paths mirror slim variable scopes
(cell_stem_0/comb_iter_0/left/separable_5x5_1/depthwise_weights, ...) so
published checkpoints convert mechanically.

Slim semantics preserved (imagenet stem, output_stride 32):
  - stem: 3x3/2 VALID conv (32 * stem_multiplier) + BN, then two stride-2
    stem cells at filter scalings 1/rate^2 and 1/rate (nasnet.py:252-278);
    nasnet stems with its Reduction cell, pnasnet with its Normal cell;
  - reduction placement: calc_reduction_layers(num_cells, 2)
    (nasnet_utils.py:48-57); skip_reduction_layer_input controls whether
    the cell after a reduction sees the pre-reduction layer (large: yes);
  - separable ops are relu -> sepconv -> BN stacked twice, stride on the
    first (nasnet_utils.py:178-206); pool ops average/max 3x3 SAME; 'none'
    inserts a strided 1x1 conv+BN only when shape must change;
  - factorized_reduction: dual avg-pool paths (the second padded and
    shifted one pixel) + half-width 1x1 convs + concat + BN
    (nasnet_utils.py:90-129);
  - BN: scale=True, eps=1e-3, inference mode ALWAYS (the reference builds
    every encoder with is_training=False, model_base.py:72-76); drop_path
    is a no-op at is_training=False (nasnet.py:113-117 _update_hparams
    forces keep_prob=1.0) and is therefore not implemented;
  - num_classes=None head = relu + global average pool.

Inception preprocessing; default image sizes 224 (mobile) / 331 (large).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers

Params = Dict[str, Any]

BN_EPS = 1e-3


class NasNetConfig(NamedTuple):
    num_cells: int
    num_conv_filters: int
    stem_multiplier: float
    filter_scaling_rate: float = 2.0
    num_reduction_layers: int = 2
    skip_reduction_layer_input: bool = False
    is_pnasnet: bool = False


CONFIGS: Dict[str, NasNetConfig] = {
    # nasnet.py:69-113, pnasnet.py:34-67
    "nasnet_mobile": NasNetConfig(12, 44, 1.0),
    "nasnet_large": NasNetConfig(18, 168, 3.0,
                                 skip_reduction_layer_input=True),
    "pnasnet_mobile": NasNetConfig(9, 54, 1.0,
                                   skip_reduction_layer_input=True,
                                   is_pnasnet=True),
    "pnasnet_large": NasNetConfig(12, 216, 3.0,
                                  skip_reduction_layer_input=True,
                                  is_pnasnet=True),
}

DEFAULT_IMAGE_SIZES = {"nasnet_mobile": 224, "nasnet_large": 331,
                       "pnasnet_mobile": 224, "pnasnet_large": 331}
FEATURE_DIMS = {"nasnet_mobile": 1056, "nasnet_large": 4032,
                "pnasnet_mobile": 1080, "pnasnet_large": 4320}

# cell programs: (operations, used_hiddenstates, hiddenstate_indices)
# nasnet_utils.py:475-524, pnasnet.py:263-280
NORMAL_CELL = (
    ["separable_5x5_2", "separable_3x3_2", "separable_5x5_2",
     "separable_3x3_2", "avg_pool_3x3", "none", "avg_pool_3x3",
     "avg_pool_3x3", "separable_3x3_2", "none"],
    [1, 0, 0, 0, 0, 0, 0],
    [0, 1, 1, 1, 0, 1, 1, 1, 0, 0],
)
REDUCTION_CELL = (
    ["separable_5x5_2", "separable_7x7_2", "max_pool_3x3",
     "separable_7x7_2", "avg_pool_3x3", "separable_5x5_2", "none",
     "avg_pool_3x3", "separable_3x3_2", "max_pool_3x3"],
    [1, 1, 1, 0, 0, 0, 0],
    [0, 1, 0, 1, 0, 1, 3, 2, 2, 0],
)
PNAS_NORMAL_CELL = (
    ["separable_5x5_2", "max_pool_3x3", "separable_7x7_2", "max_pool_3x3",
     "separable_5x5_2", "separable_3x3_2", "separable_3x3_2",
     "max_pool_3x3", "separable_3x3_2", "none"],
    [1, 1, 0, 0, 0, 0, 0],
    [1, 1, 0, 0, 0, 0, 4, 0, 1, 0],
)


# --------------------------------------------------------------------------
# Scope-path parameter store
# --------------------------------------------------------------------------

class _Store:
    """Creates (shape pass) or fetches (apply pass) params by scope path."""

    def __init__(self, params: Optional[Params] = None):
        self.fetch = params is not None
        self.params = params
        self.specs: List[Tuple[Tuple[str, ...], Tuple[int, ...], str]] = []
        self._scope: List[str] = []

    def scope(self, name: str):
        store = self

        class _Ctx:
            def __enter__(self):
                store._scope.append(name)

            def __exit__(self, *a):
                store._scope.pop()

        return _Ctx()

    def var(self, name: str, shape: Tuple[int, ...], kind: str):
        path = tuple(self._scope) + (name,)
        if self.fetch:
            node = self.params
            for p in path:
                node = node[p]
            return node
        self.specs.append((path, tuple(shape), kind))
        return jnp.zeros(shape, jnp.float32)


def _materialize(key, specs) -> Params:
    params: Params = {}
    for i, (path, shape, kind) in enumerate(specs):
        if kind == "conv":
            # variance_scaling FAN_OUT truncated normal (arg scopes)
            arr = layers.slim_variance_scaling(
                jax.random.fold_in(key, i), shape,
                shape[0] * shape[1] * shape[3])
        elif kind in ("ones",):
            arr = jnp.ones(shape, jnp.float32)
        else:  # zeros
            arr = jnp.zeros(shape, jnp.float32)
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return params


# --------------------------------------------------------------------------
# Primitive ops
# --------------------------------------------------------------------------

def _conv2d(x, w, stride=1, padding="SAME", groups=1, dtype=None):
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups).astype(jnp.float32)


def _conv(store, name, x, cout, k=1, stride=1, padding="SAME", dtype=None):
    w = store.var(f"{name}/weights", (k, k, x.shape[-1], cout), "conv")
    return _conv2d(x, w, stride, padding, dtype=dtype)


def _bn(store, name, x):
    c = x.shape[-1]
    gamma = store.var(f"{name}/gamma", (c,), "ones")
    beta = store.var(f"{name}/beta", (c,), "zeros")
    mm = store.var(f"{name}/moving_mean", (c,), "zeros")
    mv = store.var(f"{name}/moving_variance", (c,), "ones")
    inv = jax.lax.rsqrt(mv + BN_EPS) * gamma
    return (x - mm) * inv + beta


def _sep_conv(store, name, x, cout, k, stride, dtype=None):
    """slim.separable_conv2d depth_multiplier=1: depthwise + pointwise."""
    cin = x.shape[-1]
    dw = store.var(f"{name}/depthwise_weights", (k, k, cin, 1), "conv")
    pw = store.var(f"{name}/pointwise_weights", (1, 1, cin, cout), "conv")
    kernel = jnp.transpose(dw, (0, 1, 3, 2)).reshape(k, k, 1, cin)
    y = _conv2d(x, kernel, stride, "SAME", groups=cin, dtype=dtype)
    return _conv2d(y, pw, 1, "SAME", dtype=dtype)


def _max_pool(x, k, stride, padding="SAME"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, stride, stride, 1),
                                 padding)


def _avg_pool(x, k, stride, padding="SAME"):
    return layers.avg_pool_same(x, k, stride, padding)


def _stacked_separable(store, x, op, filters, stride, dtype):
    """relu -> sepconv -> BN, twice, stride on the first
    (nasnet_utils.py:178-206)."""
    k = int(op.split("x")[0][-1])
    layers = int(op.split("_")[-1]) if "x" not in op.split("_")[-1] else 1
    for i in range(1, layers + 1):
        x = jax.nn.relu(x)
        x = _sep_conv(store, f"separable_{k}x{k}_{i}", x, filters, k,
                      stride, dtype)
        x = _bn(store, f"bn_sep_{k}x{k}_{i}", x)
        stride = 1
    return x


def _factorized_reduction(store, x, out_filters, stride, dtype):
    """nasnet_utils.py:90-129."""
    if stride == 1:
        y = _conv(store, "path_conv", x, out_filters, 1, dtype=dtype)
        return _bn(store, "path_bn", y)
    p1 = x[:, ::stride, ::stride, :]
    p1 = _conv(store, "path1_conv", p1, out_filters // 2, 1, dtype=dtype)
    p2 = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
    p2 = p2[:, ::stride, ::stride, :]
    p2 = _conv(store, "path2_conv", p2,
               out_filters // 2 + out_filters % 2, 1, dtype=dtype)
    y = jnp.concatenate([p1, p2], axis=3)
    return _bn(store, "final_path_bn", y)


def _apply_conv_op(store, x, op, filters, stride, from_original, dtype):
    """nasnet_utils.py:357-394 (drop_path omitted: inference-mode build)."""
    if stride > 1 and not from_original:
        stride = 1
    cin = x.shape[-1]
    if "separable" in op:
        return _stacked_separable(store, x, op, filters, stride, dtype)
    if op == "none":
        if stride > 1 or cin != filters:
            x = jax.nn.relu(x)
            x = _conv(store, "1x1", x, filters, 1, stride, dtype=dtype)
            x = _bn(store, "bn_1", x)
        return x
    if "pool" in op:
        pool = _avg_pool if op.startswith("avg") else _max_pool
        k = int(op.split("_")[-1].split("x")[0])
        x = pool(x, k, stride)
        if cin != filters:
            x = _conv(store, "1x1", x, filters, 1, 1, dtype=dtype)
            x = _bn(store, "bn_1", x)
        return x
    raise ValueError(f"Unimplemented operation {op}")


def _cell(store, scope, program, net, prev, filters, stride, dtype):
    """One NASNet-A cell (nasnet_utils.py:295-421)."""
    ops, used, indices = program
    with store.scope(scope):
        # _reduce_prev_layer
        if prev is None:
            prev = net
        elif prev.shape[2] != net.shape[2]:
            prev = jax.nn.relu(prev)
            prev = _factorized_reduction(store, prev, filters, 2, dtype)
        elif prev.shape[-1] != filters:
            prev = jax.nn.relu(prev)
            prev = _conv(store, "prev_1x1", prev, filters, 1, dtype=dtype)
            prev = _bn(store, "prev_bn", prev)
        # _cell_base
        h = jax.nn.relu(net)
        h = _conv(store, "1x1", h, filters, 1, dtype=dtype)
        h = _bn(store, "beginning_bn", h)
        states = [h, prev]

        for it in range(5):
            with store.scope(f"comb_iter_{it}"):
                li, ri = indices[2 * it], indices[2 * it + 1]
                with store.scope("left"):
                    h1 = _apply_conv_op(store, states[li], ops[2 * it],
                                        filters, stride, li < 2, dtype)
                with store.scope("right"):
                    h2 = _apply_conv_op(store, states[ri], ops[2 * it + 1],
                                        filters, stride, ri < 2, dtype)
                states.append(h1 + h2)

        # _combine_unused_states
        with store.scope("cell_output"):
            final = states[-1]
            outs = []
            for idx, (s, is_used) in enumerate(zip(states, used)):
                mismatch = (s.shape[2] != final.shape[2]
                            or s.shape[-1] != final.shape[-1])
                if mismatch and not is_used:
                    st = 2 if s.shape[2] != final.shape[2] else 1
                    with store.scope(f"reduction_{idx}"):
                        s = _factorized_reduction(store, s,
                                                  final.shape[-1], st,
                                                  dtype)
                if not is_used:
                    outs.append(s)
            return jnp.concatenate(outs, axis=3)


# --------------------------------------------------------------------------
# Full networks
# --------------------------------------------------------------------------

def _reduction_indices(num_cells: int, num_reductions: int) -> List[int]:
    return [int(float(p) / (num_reductions + 1) * num_cells)
            for p in range(1, num_reductions + 1)]


def _forward(store: _Store, images: jnp.ndarray, cfg: NasNetConfig,
             final_endpoint: Optional[str], dtype):
    ep: Dict[str, jnp.ndarray] = {}

    def done(name, net):
        ep[name] = net
        return name == final_endpoint

    rate = cfg.filter_scaling_rate
    normal = PNAS_NORMAL_CELL if cfg.is_pnasnet else NORMAL_CELL
    stem_cell = PNAS_NORMAL_CELL if cfg.is_pnasnet else REDUCTION_CELL

    # imagenet stem (nasnet.py:252-278)
    net = _conv(store, "conv0", images, int(32 * cfg.stem_multiplier), 3, 2,
                "VALID", dtype)
    net = _bn(store, "conv0_bn", net)
    outputs: List[Optional[jnp.ndarray]] = [None, net]
    scaling = 1.0 / (rate ** 2)
    for i in range(2):
        net = _cell(store, f"cell_stem_{i}", stem_cell, net, outputs[-2],
                    int(cfg.num_conv_filters * scaling), 2, dtype)
        outputs.append(net)
        scaling *= rate
    if done("Stem", net):
        return net, ep

    reductions = _reduction_indices(cfg.num_cells,
                                    cfg.num_reduction_layers)
    scaling = 1.0
    prev = None
    for cell_num in range(cfg.num_cells):
        is_red = cell_num in reductions
        if cfg.is_pnasnet:
            # pnasnet.py:120-137: stride-2 normal cell at reductions
            if is_red:
                scaling *= rate
            if cfg.skip_reduction_layer_input or not is_red:
                prev = outputs[-2]
            net = _cell(store, f"cell_{cell_num}", normal, net, prev,
                        int(cfg.num_conv_filters * scaling),
                        2 if is_red else 1, dtype)
            if done(f"Cell_{cell_num}", net):
                return net, ep
            outputs.append(net)
            continue
        # nasnet.py:491-527
        if cfg.skip_reduction_layer_input:
            prev = outputs[-2]
        if is_red:
            scaling *= rate
            ridx = reductions.index(cell_num)
            net = _cell(store, f"reduction_cell_{ridx}", REDUCTION_CELL,
                        net, outputs[-2],
                        int(cfg.num_conv_filters * scaling), 2, dtype)
            if done(f"Reduction_Cell_{ridx}", net):
                return net, ep
            outputs.append(net)
        if not cfg.skip_reduction_layer_input:
            prev = outputs[-2]
        net = _cell(store, f"cell_{cell_num}", normal, net, prev,
                    int(cfg.num_conv_filters * scaling), 1, dtype)
        if done(f"Cell_{cell_num}", net):
            return net, ep
        outputs.append(net)

    net = jax.nn.relu(net)
    done("final_relu", net)
    return net, ep


def init_params(key, name: str = "nasnet_mobile",
                image_size: Optional[int] = None) -> Params:
    """Shape-trace the forward (no FLOPs) and materialize the pytree."""
    cfg = CONFIGS[name]
    size = image_size or DEFAULT_IMAGE_SIZES[name]
    store = _Store()
    jax.eval_shape(
        lambda x: _forward(store, x, cfg, None, None)[0],
        jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32))
    return _materialize(key, store.specs)


def apply(params: Params, images: jnp.ndarray,
          name: str = "nasnet_mobile",
          final_endpoint: Optional[str] = None, dtype=None
          ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    cfg = CONFIGS[name]
    store = _Store(params)
    return _forward(store, images, cfg, final_endpoint, dtype)


def pooled_features(net: jnp.ndarray) -> jnp.ndarray:
    """num_classes=None head: relu already applied, global average pool."""
    return jnp.mean(net, axis=(1, 2))
