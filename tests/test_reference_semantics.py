"""Regression tests for reference-parity semantics found in a round-4
review pass: TF1 Adam epsilon handling, slim per-gradient clipping, the
legacy LR floor, MultiHeadAdd's (lack of) temperature, post-dropout
alignment history, and variational OUTPUT dropout.

Each test pins the behavior against the reference formulas
(/root/reference/src/model_base.py, train_fn.py, common/ops_rnn.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from comic_tpu.models.attention import (
    AttentionConfig,
    attend,
    attention_init,
    precompute,
)
from comic_tpu.models.decoder import DecoderConfig, decoder_init, teacher_forced
from comic_tpu.training.optimizer import (
    _clip_by_norm_per_leaf,
    scale_by_tf1_adam,
)
from comic_tpu.training.schedule import legacy_halving_schedule


class TestTf1Adam:
    """tf.train.AdamOptimizer: param -= lr * sqrt(1-b2^t)/(1-b1^t)
    * m/(sqrt(v)+eps) — eps OUTSIDE the bias correction
    (model_base.py:858-867 uses it with the reference's large 1e-2)."""

    B1, B2, EPS = 0.9, 0.999, 1e-2

    def _numpy_tf1_rollout(self, grads, lr):
        m = np.zeros_like(grads[0])
        v = np.zeros_like(grads[0])
        p = np.zeros_like(grads[0])
        for t, g in enumerate(grads, start=1):
            m = self.B1 * m + (1 - self.B1) * g
            v = self.B2 * v + (1 - self.B2) * g * g
            lr_t = lr * np.sqrt(1 - self.B2 ** t) / (1 - self.B1 ** t)
            p = p - lr_t * m / (np.sqrt(v) + self.EPS)
        return p

    def test_matches_tf_formula_exactly(self):
        rng = np.random.default_rng(0)
        grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(5)]
        lr = 0.01
        opt = optax.chain(
            scale_by_tf1_adam(b1=self.B1, b2=self.B2, eps=self.EPS),
            optax.scale_by_learning_rate(lambda _: lr))
        params = {"w": jnp.zeros((7,))}
        state = opt.init(params)
        for g in grads:
            updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
        want = self._numpy_tf1_rollout(grads, lr)
        # f32 accumulation vs the f64 numpy rollout
        np.testing.assert_allclose(np.asarray(params["w"]), want,
                                   rtol=3e-5, atol=1e-7)

    def test_differs_from_optax_adam_in_eps_regime(self):
        # optax.adam's effective eps is eps*sqrt(1-b2^t): ~32x smaller at
        # step 1 with the reference's eps=1e-2 — the first step must
        # differ materially
        g = {"w": jnp.full((4,), 0.001)}
        p0 = {"w": jnp.zeros((4,))}
        ours = optax.chain(
            scale_by_tf1_adam(eps=self.EPS),
            optax.scale_by_learning_rate(lambda _: 1.0))
        ref_optax = optax.adam(learning_rate=1.0, eps=self.EPS)
        u1, _ = ours.update(g, ours.init(p0), p0)
        u2, _ = ref_optax.update(g, ref_optax.init(p0), p0)
        ratio = float(u2["w"][0] / u1["w"][0])
        assert ratio > 5.0, ratio  # optax takes a much larger step


class TestPerLeafClip:
    def test_clips_each_gradient_independently(self):
        # slim clip_gradient_norms = tf.clip_by_norm per grad
        # (create_train_op, model_base.py:397-401) — NOT a global clip
        clip = _clip_by_norm_per_leaf(1.0)
        g = {"big": jnp.asarray([3.0, 4.0]),      # norm 5 -> scaled by 1/5
             "small": jnp.asarray([0.3, 0.4])}    # norm 0.5 -> untouched
        out, _ = clip.update(g, clip.init(None))
        np.testing.assert_allclose(np.asarray(out["big"]), [0.6, 0.8],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out["small"]), [0.3, 0.4],
                                   rtol=1e-6)


class TestLegacyLrFloor:
    def test_halving_clamps_at_lr_end(self):
        # _lr_reduce_check stops at lr_end (train_fn.py:310-317)
        f = legacy_halving_schedule(1e-2, steps_per_epoch=10,
                                    reduce_every_n_epochs=1, lr_end=1e-3)
        np.testing.assert_allclose(float(f(jnp.asarray(0))), 1e-2,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(f(jnp.asarray(20))), 2.5e-3,
                                   rtol=1e-6)
        # epoch 10: raw halving would give ~9.8e-6; the floor holds
        np.testing.assert_allclose(float(f(jnp.asarray(100))), 1e-3,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(f(jnp.asarray(10_000))), 1e-3,
                                   rtol=1e-6)


class TestAddAlignmentHasNoTemperature:
    def test_param_tree_and_score(self):
        # MultiHeadAdd (ops_rnn.py:568-600) has no softmax_temperature;
        # only MultiHeadAddLN (ops_rnn.py:554-563) scales
        cfg = AttentionConfig(num_units=8, num_heads=2, memory_channels=6,
                              alignment="add", fm_projection="tied")
        p = attention_init(jax.random.PRNGKey(0), cfg)
        assert "softmax_temperature" not in p
        fm = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 5, 6)).astype(np.float32))
        mem = precompute(p, cfg, fm)
        ctx, align = attend(p, cfg, jnp.ones((2, 8)), mem)
        assert ctx.shape == (2, 8) and align.shape == (2, 2, 5)
        cfg_ln = AttentionConfig(num_units=8, num_heads=2,
                                 memory_channels=6, alignment="add_LN",
                                 fm_projection="tied")
        p_ln = attention_init(jax.random.PRNGKey(0), cfg_ln)
        assert "softmax_temperature" in p_ln


class TestAlignmentHistoryIsPostDropout:
    def test_attend_returns_dropped_alignments(self):
        # the reference drops alignments BEFORE both the context matmul
        # and the alignment_history write (ops_rnn.py:696-745); the map
        # loss consumes the history, so attend must return the dropped map
        cfg = AttentionConfig(num_units=8, num_heads=2, memory_channels=6,
                              alignment="add_LN", fm_projection="tied")
        p = attention_init(jax.random.PRNGKey(1), cfg)
        fm = jnp.asarray(np.random.default_rng(1).normal(
            size=(4, 5, 6)).astype(np.float32))
        mem = precompute(p, cfg, fm)
        q = jnp.ones((4, 8))
        _, clean = attend(p, cfg, q, mem)
        _, dropped = attend(p, cfg, q, mem,
                            alignments_dropout_key=jax.random.PRNGKey(7),
                            alignments_keep_prob=0.5)
        clean, dropped = np.asarray(clean), np.asarray(dropped)
        zeros = dropped == 0.0
        assert zeros.any(), "keep_prob=0.5 must zero some entries"
        # kept entries are the clean ones scaled by 1/keep_prob
        np.testing.assert_allclose(dropped[~zeros], clean[~zeros] / 0.5,
                                   rtol=1e-5)


class TestVariationalOutputDropout:
    """tf DropoutWrapper(variational_recurrent=True) fixes the OUTPUT
    noise across time steps too (_recurrent_output_noise), not just the
    input noise (model_base.py:636-648)."""

    def _logits_zero_pattern(self, recurrent):
        attn = AttentionConfig(num_units=16, num_heads=2,
                               memory_channels=12, fm_projection="tied")
        cfg = DecoderConfig(
            token_type="radix", softmax_size=16, rnn_name="LSTM",
            rnn_size=16, word_size=8, init_method="first_input",
            image_embed_size=20, attention=attn, start_id=8, end_id=9,
            dropout_in=0.0, dropout_out=0.5, recurrent_dropout=recurrent)
        p = decoder_init(jax.random.PRNGKey(3), cfg)
        # identity output head: logits == h_dropped, so the dropout mask's
        # zero pattern is directly observable
        p["output_projection"]["kernel"] = jnp.eye(16)
        p["output_projection"]["bias"] = jnp.zeros((16,))
        rng = np.random.default_rng(3)
        B, T, L = 3, 8, 4
        inputs = jnp.asarray(rng.integers(0, 8, size=(B, T)))
        im = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))
        fm = jnp.asarray(rng.normal(size=(B, L, 12)).astype(np.float32))
        logits, _ = teacher_forced(p, cfg, inputs, im, fm,
                                   rng=jax.random.PRNGKey(11),
                                   training=True)
        return np.asarray(logits) == 0.0  # (B, T, 16)

    def test_output_mask_fixed_across_time_when_variational(self):
        z = self._logits_zero_pattern(recurrent=True)
        # each (batch, unit) column is dropped at every step or at none
        same_every_step = (z.all(axis=1) | (~z).all(axis=1))
        assert same_every_step.all(), "output mask must not change per step"
        assert z.any(), "keep_prob=0.5 must drop some units"

    def test_output_mask_varies_without_variational_flag(self):
        z = self._logits_zero_pattern(recurrent=False)
        mixed = ~(z.all(axis=1) | (~z).all(axis=1))
        assert mixed.any(), "per-step masks should differ across time"
