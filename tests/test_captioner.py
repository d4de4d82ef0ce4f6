"""Caption-model assembly and loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.configuration import Config
from comic_tpu.models.captioner import (
    attention_map_loss,
    build_model_spec,
    init_params,
    max_decode_steps,
    process_captions,
    sequence_loss,
    softmax_size_for,
    start_end_ids,
    xe_forward,
    scst_forward,
)
from comic_tpu.tokenization import PAD, UNK, GO, EOS, Vocabulary


def _vocab(n_words=6):
    wtoi = {PAD: -1}
    for i in range(n_words):
        wtoi[f"w{i}"] = i
    wtoi[UNK] = n_words
    wtoi[GO] = n_words + 1
    wtoi[EOS] = n_words + 2
    return Vocabulary(wtoi)


class TestSpec:
    def test_softmax_sizes(self):
        v = _vocab()
        assert softmax_size_for(Config(token_type="radix", radix_base=8), v) == 10
        assert softmax_size_for(Config(token_type="word"), v) == len(v.itow)

    def test_start_end(self):
        v = _vocab()
        assert start_end_ids(Config(token_type="radix", radix_base=8), v) == (8, 9)
        assert start_end_ids(Config(token_type="word"), v) == (v.go_id, v.eos_id)

    def test_max_decode_steps(self):
        v = _vocab()  # len(wtoi)=10 -> base 8 width 2
        c = Config(token_type="radix", radix_base=8, infer_max_length=30)
        assert max_decode_steps(c, v) == 60
        assert max_decode_steps(Config(token_type="word", infer_max_length=30), v) == 30
        assert max_decode_steps(Config(token_type="char", infer_max_length=30), v) == 150

    def test_build_spec_comic256_defaults(self):
        v = _vocab()
        spec = build_model_spec(Config(), v)
        d = spec.decoder
        assert d.softmax_size == 258 and d.start_id == 256 and d.end_id == 257
        assert d.attention.num_heads == 8
        assert d.attention.memory_channels == 832
        assert d.attention.fm_projection == "tied"
        assert spec.compute_dtype == jnp.bfloat16


class TestProcessCaptions:
    def test_inputs_targets_mask(self):
        cap = jnp.asarray([[4, 0, 1, 5, -1, -1]])
        inputs, targets, mask = process_captions(cap)
        np.testing.assert_array_equal(inputs, [[4, 0, 1, 5, -1]])
        np.testing.assert_array_equal(targets, [[0, 1, 5, 0, 0]])
        np.testing.assert_array_equal(mask, [[1, 1, 1, 0, 0]])


class TestSequenceLoss:
    def test_matches_manual(self, rng):
        B, T, V = 2, 4, 5
        logits = jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32))
        targets = jnp.asarray(rng.integers(0, V, size=(B, T)))
        w = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 0]], jnp.float32)
        got = sequence_loss(logits, targets, w)
        lp = np.asarray(jax.nn.log_softmax(logits, -1))
        xent = -np.take_along_axis(lp, np.asarray(targets)[..., None], -1)[..., 0]
        want = (xent * np.asarray(w)).sum() / 3.0 / 1.0
        want = (xent * np.asarray(w)).sum() / np.asarray(w).sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_per_example(self, rng):
        B, T, V = 2, 3, 4
        logits = jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32))
        targets = jnp.zeros((B, T), jnp.int32)
        w = jnp.asarray([[1, 0, 0], [1, 1, 1]], jnp.float32)
        per = sequence_loss(logits, targets, w, average_across_batch=False)
        assert per.shape == (B,)
        lp = np.asarray(jax.nn.log_softmax(logits, -1))[:, :, 0]
        want0 = -lp[0, 0]
        want1 = -(lp[1]).mean()
        np.testing.assert_allclose(per, [want0, want1], rtol=1e-5)


class TestMapLoss:
    def test_head_sum_semantics(self):
        # one head summing to one at every position -> loss = mean((1-a)^2)
        align = jnp.full((2, 3, 1, 4), 0.25)
        got = attention_map_loss(align, scale=2.0)
        np.testing.assert_allclose(got, ((1 - 0.25) ** 2) * 2.0, rtol=1e-6)

    def test_zero_scale(self):
        assert attention_map_loss(jnp.ones((1, 1, 1, 1)), 0.0) == 0.0


@pytest.mark.slow
class TestForward:
    def test_xe_forward_end_to_end_tiny(self):
        v = _vocab()
        c = Config(token_type="radix", radix_base=8, rnn_size=16,
                   rnn_word_size=8, attn_num_heads=2, compute_dtype="float32",
                   cnn_input_size=(224, 224))
        spec = build_model_spec(c, v)
        params = init_params(jax.random.PRNGKey(0), spec)
        B, T = 2, 6
        images = jnp.zeros((B, 64, 64, 3))
        caps = jnp.asarray([[8, 0, 1, 9, -1, -1], [8, 2, 3, 4, 9, -1]])
        loss, aux = jax.jit(
            lambda p, im, cp: xe_forward(p, spec, im, cp))(params, images, caps)
        assert np.isfinite(float(loss))
        assert aux["logits"].shape == (B, T - 1, 10)

    def test_scst_forward_reward_weighting(self):
        v = _vocab()
        c = Config(token_type="radix", radix_base=8, rnn_size=16,
                   rnn_word_size=8, attn_num_heads=2, compute_dtype="float32")
        spec = build_model_spec(c, v)
        params = init_params(jax.random.PRNGKey(0), spec)
        images = jnp.zeros((2, 64, 64, 3))
        caps = jnp.asarray([[8, 0, 9, -1], [8, 1, 2, 9]])
        z, _ = scst_forward(params, spec, images, caps,
                            jnp.asarray([0.0, 0.0]))
        np.testing.assert_allclose(float(z), 0.0, atol=1e-6)
        l1, _ = scst_forward(params, spec, images, caps,
                             jnp.asarray([1.0, 1.0]))
        assert float(l1) != 0.0
