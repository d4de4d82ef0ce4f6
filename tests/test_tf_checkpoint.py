"""Slim-checkpoint conversion wiring for the FULL encoder zoo.

The disk round trip through a real TF1 checkpoint is covered in
test_prepro.py::TestSlimConverter (inception_v1). These tests cover the
name-mapping layer for every registered encoder: a slim-style
{var name: array} dict is synthesized from the encoder's own init tree
(the param layout deliberately mirrors slim naming), run through
slim_reader_to_tree + convert_slim_tree, and verified for treedef + value
equality. Classifier decoys assert the drop logic.
"""

import numpy as np
import pytest

import jax

from comic_tpu.models.encoders import available_encoders, get_encoder
from comic_tpu.utils.net_params import NET_PARAMS, get_net_params
from comic_tpu.utils.tf_checkpoint import (
    ROOT_SCOPES,
    convert_slim_tree,
    slim_reader_to_tree,
)


def _flatten(tree, path=""):
    for k, v in sorted(tree.items()):
        sub = f"{path}/{k}" if path else k
        if isinstance(v, dict):
            yield from _flatten(v, sub)
        else:
            yield sub, np.asarray(v)


@pytest.mark.parametrize("name", sorted(ROOT_SCOPES))
def test_convert_wiring_all_encoders(name):
    if name not in available_encoders():
        pytest.skip(f"{name} encoder not implemented yet")
    spec = get_encoder(name)
    template = spec.init(jax.random.PRNGKey(0))
    scope = ROOT_SCOPES[name]

    rng = np.random.default_rng(0)
    ckpt = {}
    for var, arr in _flatten(template):
        ckpt[f"{scope}/{var}"] = rng.normal(size=arr.shape).astype(
            np.float32)
    # classifier/aux decoys that real slim checkpoints carry
    ckpt[f"{scope}/Logits/Conv2d_0c_1x1/weights"] = np.zeros((1, 1, 4, 10))
    ckpt[f"{scope}/logits/weights"] = np.zeros((1, 1, 4, 10))
    ckpt[f"{scope}/fc8/weights"] = np.zeros((1, 1, 4096, 1000))
    ckpt["OtherScope/conv/weights"] = np.zeros((3,))

    stripped = slim_reader_to_tree(ckpt, scope)
    out = convert_slim_tree(stripped, template)

    # identical treedef and per-leaf values
    t_leaves = list(_flatten(template))
    o_leaves = list(_flatten(out))
    assert [k for k, _ in t_leaves] == [k for k, _ in o_leaves]
    for k, arr in o_leaves:
        np.testing.assert_array_equal(arr, ckpt[f"{scope}/{k}"], err_msg=k)


def test_every_registered_encoder_has_converter_wiring():
    """No encoder may be decorative: everything in the zoo registry must
    have a slim root scope (reference net_params.py:19-106 loads them all).
    nasnet/pnasnet have no entries in the reference's pretrained registry
    (net_params.py:19-91), so they are exempt."""
    for name in available_encoders():
        if name.startswith(("nasnet", "pnasnet")):
            continue
        assert name in ROOT_SCOPES, f"{name} missing converter wiring"


def test_net_params_registry_matches_reference():
    """URL registry covers the reference's net list and resolves paths."""
    want = {
        "vgg_16", "resnet_v1_50", "resnet_v1_101", "resnet_v1_152",
        "resnet_v2_50", "resnet_v2_101", "resnet_v2_152", "inception_v1",
        "inception_v2", "inception_v3", "inception_v4",
        "inception_resnet_v2", "mobilenet_v2",
    }
    assert want <= set(NET_PARAMS)
    net = get_net_params("mobilenet_v2")
    assert net["name"] == "mobilenet_v2"
    assert net["ckpt_path"].endswith("mobilenet_v2_1.0_224.ckpt")
    assert net["converted_path"].endswith(".msgpack")
    with pytest.raises(ValueError):
        get_net_params("alexnet")
