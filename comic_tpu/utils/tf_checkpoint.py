"""TF-slim checkpoint -> JAX parameter-tree conversion.

The reference initializes its encoder from vanilla slim ImageNet
checkpoints by stripping the scope prefix (model_base.py:471-484, registry
at common/net_params.py:19-106). This converter reads a TF checkpoint
(TF1 V1/V2 format via tf.train.load_checkpoint) and rebuilds the matching
comic_tpu encoder parameter pytree, preserving the HWIO conv layout
(identical between slim NHWC and our lax convs — no transposes needed).
Every comic_tpu encoder's param tree deliberately mirrors the slim variable
layout below its root scope (CLAUDE.md conventions), so conversion is
"strip root scope + drop classifier heads" for the whole zoo.

Variable name contract (slim), e.g.:
  InceptionV1/<Block>[/Branch_i/<Conv>]/weights
  InceptionV1/.../BatchNorm/{beta,moving_mean,moving_variance[,gamma]}
  resnet_v1_50/block1/unit_1/bottleneck_v1/conv1/{weights,BatchNorm/...}
  vgg_16/conv1/conv1_1/{weights,biases}
  MobilenetV1/Conv2d_1_depthwise/{depthwise_weights,BatchNorm/...}
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from ..training.checkpoints import save_cnn_checkpoint

# encoder name -> slim root scope (common/nets/*.py arg_scopes)
ROOT_SCOPES: Dict[str, str] = {
    "inception_v1": "InceptionV1",
    "inception_v2": "InceptionV2",
    "inception_v3": "InceptionV3",
    "inception_v4": "InceptionV4",
    "inception_resnet_v2": "InceptionResnetV2",
    "resnet_v1_50": "resnet_v1_50",
    "resnet_v1_101": "resnet_v1_101",
    "resnet_v1_152": "resnet_v1_152",
    "resnet_v2_50": "resnet_v2_50",
    "resnet_v2_101": "resnet_v2_101",
    "resnet_v2_152": "resnet_v2_152",
    "vgg_16": "vgg_16",
    "vgg_19": "vgg_19",
    "mobilenet_v1": "MobilenetV1",
    "mobilenet_v2": "MobilenetV2",
}

# classifier / aux-head scopes dropped during conversion — every encoder is
# built num_classes=None (model_base.py:72-76 uses features only)
_DROP_SCOPES = frozenset({
    "Logits", "AuxLogits", "logits", "predictions", "Predictions",
    "fc8",          # vgg classifier
    "Conv2d_1c_1x1",  # mobilenet_v1 classifier conv lives under Logits; kept
                      # here defensively for flat exports
})


def _walk_set(tree: Dict[str, Any], parts, value) -> None:
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def slim_reader_to_tree(name_to_array: Dict[str, np.ndarray],
                        root_scope: str = "InceptionV1") -> Dict[str, Any]:
    """{var name: array} -> nested param dict matching the encoder's
    init_params tree (root scope stripped, classifier heads dropped)."""
    tree: Dict[str, Any] = {}
    prefix = root_scope + "/"
    for name, arr in name_to_array.items():
        if not name.startswith(prefix):
            continue
        parts = name[len(prefix):].split("/")
        if parts[0] in _DROP_SCOPES:
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


def _has_leaves(tree: Any) -> bool:
    if not isinstance(tree, dict):
        return True
    return any(_has_leaves(v) for v in tree.values())


def verify_tree_shapes(converted: Dict[str, Any],
                       template: Dict[str, Any], path: str = "") -> None:
    """Raise if the converted tree is missing leaves or has shape drift.

    Template subtrees with no leaves (e.g. inception v3/v4 pool branches,
    which hold no parameters) have no checkpoint variables and are skipped.
    """
    for k, tpl in template.items():
        sub = f"{path}/{k}" if path else k
        if isinstance(tpl, dict) and not _has_leaves(tpl):
            continue
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


def convert_slim_tree(converted: Dict[str, Any], template: Dict[str, Any]
                      ) -> Dict[str, Any]:
    """Shape-verify and re-key a stripped slim tree onto the template's
    treedef (guarantees an identical pytree structure for restore)."""
    verify_tree_shapes(converted, template)

    def merge(tpl, conv):
        if isinstance(tpl, dict):
            # leafless template subtrees (pool branches) stay empty
            return {k: merge(tpl[k], conv.get(k, {})) for k in tpl}
        return np.asarray(conv, dtype=np.float32)

    return merge(template, converted)


def convert_slim_checkpoint(ckpt_path: str, out_path: str,
                            cnn_name: str = "inception_v1") -> str:
    """slim ckpt -> comic_tpu encoder checkpoint (msgpack), any registered
    encoder (reference loads all of them, net_params.py:19-106)."""
    import jax

    from ..models.encoders import get_encoder

    root_scope = ROOT_SCOPES.get(cnn_name)
    if root_scope is None:
        raise ValueError(f"No converter wiring for {cnn_name}; "
                         f"known: {sorted(ROOT_SCOPES)}")
    spec = get_encoder(cnn_name)
    template = spec.init(jax.random.PRNGKey(0))
    converted = load_slim_checkpoint(ckpt_path, root_scope)
    out = convert_slim_tree(converted, template)
    save_cnn_checkpoint(out_path, out)
    return out_path
