"""End-to-end slim-checkpoint conversion against REAL TF checkpoints.

The reference initializes encoders from slim ImageNet checkpoints on disk
(model_base.py:471-484). No pretrained checkpoints ship in this image, so
these tests manufacture genuine TF1-format checkpoints (tf.compat.v1
Saver, V2 file format — the same format tf.train.load_checkpoint reads
for the real slim releases) holding every variable of an encoder under
its slim scope names, then drive the FULL conversion path:

    .ckpt on disk -> load_slim_checkpoint (tf.train.load_checkpoint)
    -> convert_slim_tree -> msgpack artifact -> restore_model('cnn')

and check the restored encoder params are bit-identical to the source
arrays. Optimizer slot variables and global_step are planted to verify
they are skipped.
"""

import os

import numpy as np
import pytest

import jax

from comic_tpu.models.encoders import get_encoder
from comic_tpu.training import checkpoints as ckpt
from comic_tpu.utils import tf_checkpoint as tfc

tf = pytest.importorskip("tensorflow")


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def _write_tf1_checkpoint(directory, name_to_array, extra=()):
    v1 = tf.compat.v1
    g = v1.Graph()
    with g.as_default():
        for name, arr in name_to_array.items():
            v1.get_variable(name, initializer=tf.constant(arr))
        for name, arr in extra:
            v1.get_variable(name, initializer=tf.constant(arr))
        saver = v1.train.Saver()
        with v1.Session(graph=g) as sess:
            sess.run(v1.global_variables_initializer())
            return saver.save(sess, os.path.join(directory, "model.ckpt"))


def _assert_trees_equal(got, want, path=""):
    assert set(got) == set(want), f"key drift at {path or '<root>'}"
    for k in want:
        sub = f"{path}/{k}" if path else k
        if isinstance(want[k], dict):
            _assert_trees_equal(got[k], want[k], sub)
        else:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]), err_msg=sub)


@pytest.mark.parametrize("cnn_name", ["inception_v1", "mobilenet_v2",
                                      "nasnet_mobile", "pnasnet_large"])
def test_convert_real_tf_checkpoint_roundtrip(cnn_name, tmp_path):
    """nasnet/pnasnet exercise the rootless-checkpoint path (no slim root
    scope) AND the compound scope-path leaf keys of the traced param
    store (models/nasnet.py path contract)."""
    spec = get_encoder(cnn_name)
    template = spec.init(jax.random.PRNGKey(3))
    root = tfc.ROOT_SCOPES[cnn_name]
    src = _flatten(jax.tree_util.tree_map(np.asarray, template), root)

    # plant classifier-head + optimizer-slot vars that MUST be dropped
    first = next(iter(src))
    head = (f"{root}/Logits/Conv2d_0c_1x1/weights" if root
            else "final_layer/FC/weights")  # nasnet classifier head
    extra = [
        (head, np.zeros((1, 1, 8, 1001), np.float32)),
        (first + "/Momentum", np.zeros_like(src[first])),
        ("global_step", np.int64(7)),
    ]
    if not root:  # nasnet aux tower must be dropped too
        extra.append(("aux_7/aux_bn0/beta", np.zeros((8,), np.float32)))
    ckpt_path = _write_tf1_checkpoint(str(tmp_path), src, extra)
    assert os.path.exists(ckpt_path + ".index")  # real V2-format files

    out_path = str(tmp_path / f"{cnn_name}_converted.msgpack")
    tfc.convert_slim_checkpoint(ckpt_path, out_path, cnn_name)

    # the artifact restores through the 3-way restore's CNN branch
    params = {"encoder": {"cnn": jax.tree_util.tree_map(
        lambda a: np.zeros_like(np.asarray(a)), template)}}
    restored, _, step, mode = ckpt.restore_model(params, out_path)
    assert mode == "cnn" and step == 0
    _assert_trees_equal(restored["encoder"]["cnn"], template)


def test_loader_skips_slots_and_offscope_vars(tmp_path):
    """load_slim_checkpoint drops optimizer slots, global_step, and
    variables outside the root scope."""
    src = {"InceptionV1/Conv2d_1a_7x7/weights": np.ones((7, 7, 3, 64),
                                                        np.float32)}
    extra = [
        ("InceptionV1/Conv2d_1a_7x7/weights/Momentum",
         np.zeros((7, 7, 3, 64), np.float32)),
        ("OtherScope/weights", np.zeros((3,), np.float32)),
        ("global_step", np.int64(11)),
    ]
    path = _write_tf1_checkpoint(str(tmp_path), src, extra)
    tree = tfc.load_slim_checkpoint(path, "InceptionV1")
    assert list(tree) == ["Conv2d_1a_7x7"]
    assert list(tree["Conv2d_1a_7x7"]) == ["weights"]
