"""Full-pipeline TF-twin greedy golden: encoder -> handoff -> decoder.

Composes the two existing twin halves (the raw-tf.nn inception_v1 twin
from tests/test_composed_goldens.py and the raw-tf decoder twin from
tests/test_decoder_twin.py) through the REAL reference-checkpoint restore
path, and compares greedy captions + attention maps end to end.

This closes the one seam neither twin covers on its own: the
encoder->decoder handoff — the NHWC -> (B, H'*W', C) feature-map reshape
that builds the attention memory and the global-average-pooled Mixed_5c
squeeze that seeds the RNN (/root/reference/src/model_base.py:93-104;
ours: comic_tpu/models/encoders.py encode_images).

Flow:
    manufacture a reference-named FULL-model TF1 checkpoint
        (CNN under Model/encoder/cnn/InceptionV1/..., decoder under
         Model/decoder/rnn_decoder/..., exactly as train_fn.py:66-70
         saves model_compact-N)
    -> convert_reference_checkpoint -> restore_model          (jax side)
    -> tf.train.load_checkpoint by reference variable names   (twin side)
    -> greedy decode both, assert identical ids and matching maps.

The twin side never touches comic_tpu math and the jax side never sees
the planted arrays except through the converter, so a bug in either the
converter's semantic mapping, the CNN, the handoff, or the decoder step
shows up as a caption/logit mismatch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comic_tpu.configuration import Config
from comic_tpu.decoding.search import greedy_or_sample
from comic_tpu.models.captioner import build_model_spec, init_params
from comic_tpu.models.encoders import encode_images
from comic_tpu.training import checkpoints as ckpt
from comic_tpu.utils import tf_checkpoint as tfc

from test_composed_goldens import (_np, _randomize,
                                   inception_v1_twin_endpoints)
from test_decoder_twin import _twin_greedy, _twin_weights
from test_reference_ckpt import (_flat_paths, _flatten,
                                 _reference_var_names,
                                 _write_tf1_checkpoint, _vocab)

tf = pytest.importorskip("tensorflow")

B, HW = 2, 96  # Mixed_4f at 96x96 input -> (B, 6, 6, 832), L = 36
MAX_STEPS = 10
CNN_PREFIX = "Model/encoder/cnn/InceptionV1"


def _manufacture_full(config, rng, tmp_path):
    """Reference-named full-model ckpt with REALISTIC magnitudes.

    test_reference_ckpt's `_rand_like` (std-1 everywhere) is fine for the
    bit-exactness roundtrip but blows up a 22-layer CNN's activations, so
    the encoder uses the composed-golden randomization (small conv
    weights, non-identity BN stats) and the decoder uses moderate-scale
    weights with a sane positive softmax temperature.
    """
    vocab = _vocab()
    spec = build_model_spec(config, vocab)
    template = init_params(jax.random.PRNGKey(0), spec)

    cnn_src = _np(_randomize(template["encoder"]["cnn"], rng, w_std=0.05))
    dec_src = jax.tree_util.tree_map(
        lambda x: (rng.standard_normal(np.shape(x)) * 0.3).astype(
            np.float32),
        template["decoder"])
    tmpl_temp = template["decoder"]["attention"]["softmax_temperature"]
    dec_src["attention"]["softmax_temperature"] = np.full(
        np.shape(tmpl_temp), 1.3, np.float32)

    tf_vars = dict(_flatten(cnn_src, CNN_PREFIX))
    names = _reference_var_names(config, template["decoder"])
    for path, leaf in _flat_paths(dec_src):
        tf_vars[names[path]] = np.asarray(leaf)
    path = _write_tf1_checkpoint(tmp_path, tf_vars)
    return path, template, spec, vocab, cnn_src


def _twin_cnn_weights(ckpt_path, cnn_template):
    """Read the CNN tree from the checkpoint by REFERENCE names."""
    reader = tf.train.load_checkpoint(ckpt_path)

    def walk(tree, scope):
        out = {}
        for k, v in tree.items():
            name = f"{scope}/{k}"
            out[k] = (walk(v, name) if isinstance(v, dict)
                      else reader.get_tensor(name))
        return out

    return walk(cnn_template, CNN_PREFIX)


def test_full_pipeline_greedy_twin(rng, tmp_path):
    config = Config(token_type="radix", radix_base=32, rnn_size=64,
                    rnn_word_size=16, attn_num_heads=4,
                    compute_dtype="float32")
    path, template, spec, vocab, _ = _manufacture_full(config, rng,
                                                       tmp_path)

    # --- jax side: the real restore path, then the real serve math ---
    out = tfc.convert_reference_checkpoint(path, config, vocab)
    params, _, _, mode = ckpt.restore_model(template, out)
    assert mode == "model"

    images = (rng.normal(size=(B, HW, HW, 3)) * 0.5).astype(np.float32)
    dec = greedy_or_sample(params, spec, jnp.asarray(images),
                           max_steps=MAX_STEPS, collect_alignments=True)

    # --- twin side: raw-tf encoder + handoff + decoder, ckpt by name ---
    pn = _twin_cnn_weights(path, template["encoder"]["cnn"])
    ep = inception_v1_twin_endpoints(pn, tf.constant(images))
    fm = ep["Mixed_4f"]
    b, h, w_, c = fm.shape
    t_fmaps = tf.reshape(fm, (b, h * w_, c)).numpy()      # (B, 36, 832)
    t_embed = tf.reduce_mean(ep["Mixed_5c"], axis=[1, 2]).numpy()

    # the handoff itself, checked directly for diagnosability
    j_embed, j_fmaps = encode_images(params["encoder"], jnp.asarray(images),
                                     spec.cnn_name, spec.fm_endpoint)
    np.testing.assert_allclose(np.asarray(j_fmaps), t_fmaps,
                               rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(j_embed), t_embed,
                               rtol=2e-3, atol=5e-3)

    w = _twin_weights(path)
    t_ids, t_aligns = _twin_greedy(
        w, config.attn_num_heads, config.attn_probability_fn,
        spec.decoder.start_id, spec.decoder.end_id, MAX_STEPS,
        t_embed, t_fmaps)

    # greedy captions must be IDENTICAL token for token
    np.testing.assert_array_equal(np.asarray(dec.ids), t_ids)
    # attention maps (B, H, T, L): probabilities, downstream of the
    # CNN's ~1e-3 cross-framework float drift
    np.testing.assert_allclose(np.asarray(dec.alignments), t_aligns,
                               rtol=5e-3, atol=1e-3)
