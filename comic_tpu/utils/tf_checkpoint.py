"""TF-slim checkpoint -> JAX parameter-tree conversion.

The reference initializes its encoder from vanilla slim ImageNet
checkpoints by stripping the scope prefix (model_base.py:471-484, registry
at common/net_params.py:19-106). This converter reads a TF checkpoint
(TF1 V1/V2 format via tf.train.load_checkpoint) and rebuilds the
comic_tpu Inception-V1 parameter pytree, preserving the HWIO conv layout
(identical between slim NHWC and our lax convs — no transposes needed).

Variable name contract (slim):
  InceptionV1/<Block>[/Branch_i/<Conv>]/weights
  InceptionV1/<Block>[/Branch_i/<Conv>]/BatchNorm/{beta,moving_mean,
                                                   moving_variance[,gamma]}
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from ..training.checkpoints import save_cnn_checkpoint


def _walk_set(tree: Dict[str, Any], parts, value) -> None:
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def slim_reader_to_tree(name_to_array: Dict[str, np.ndarray],
                        root_scope: str = "InceptionV1") -> Dict[str, Any]:
    """{var name: array} -> nested param dict matching
    models/inception_v1.init_params."""
    tree: Dict[str, Any] = {}
    prefix = root_scope + "/"
    for name, arr in name_to_array.items():
        if not name.startswith(prefix):
            continue
        parts = name[len(prefix):].split("/")
        # drop classifier/aux heads — we build the num_classes=None net
        if parts[0] in ("Logits", "AuxLogits"):
            continue
        _walk_set(tree, parts, np.asarray(arr))
    return tree


def load_slim_checkpoint(ckpt_path: str, root_scope: str = "InceptionV1"
                         ) -> Dict[str, Any]:
    """Read a TF checkpoint from disk (requires tensorflow)."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    arrays = {}
    for name in shapes:
        # skip optimizer slots (Momentum/Adam/ExponentialMovingAverage)
        low = name.lower()
        if any(s in low for s in ("momentum", "adam", "rmsprop",
                                  "global_step", "exponentialmovingaverage")):
            continue
        arrays[name] = reader.get_tensor(name)
    return slim_reader_to_tree(arrays, root_scope)


def verify_tree_shapes(converted: Dict[str, Any],
                       template: Dict[str, Any], path: str = "") -> None:
    """Raise if the converted tree is missing leaves or has shape drift."""
    for k, tpl in template.items():
        sub = f"{path}/{k}" if path else k
        if k not in converted:
            raise KeyError(f"Missing converted variable subtree: {sub}")
        if isinstance(tpl, dict):
            verify_tree_shapes(converted[k], tpl, sub)
        else:
            got = np.asarray(converted[k])
            if tuple(got.shape) != tuple(tpl.shape):
                raise ValueError(
                    f"Shape mismatch at {sub}: ckpt {got.shape} vs "
                    f"model {tuple(tpl.shape)}")


def convert_slim_checkpoint(ckpt_path: str, out_path: str,
                            cnn_name: str = "inception_v1") -> str:
    """slim ckpt -> comic_tpu encoder checkpoint (msgpack)."""
    import jax

    from ..models.encoders import get_encoder

    root_scope = {"inception_v1": "InceptionV1"}.get(cnn_name)
    if root_scope is None:
        raise ValueError(f"No converter wiring for {cnn_name}")
    spec = get_encoder(cnn_name)
    template = spec.init(jax.random.PRNGKey(0))
    converted = load_slim_checkpoint(ckpt_path, root_scope)
    verify_tree_shapes(converted, template)
    out = jax.tree_util.tree_map(
        lambda tpl, arr=None: arr, template)  # placeholder structure
    # rebuild with template ordering to guarantee identical treedef
    def merge(tpl, conv):
        if isinstance(tpl, dict):
            return {k: merge(tpl[k], conv[k]) for k in tpl}
        return np.asarray(conv, dtype=np.float32)

    out = merge(template, converted)
    save_cnn_checkpoint(out_path, out)
    return out_path
