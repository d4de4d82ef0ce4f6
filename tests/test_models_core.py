"""Golden-math and structural tests for layers, cells, attention, decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.models import layers
from comic_tpu.models.attention import (
    AttentionConfig,
    attend,
    attention_init,
    precompute,
)
from comic_tpu.models.cells import Cell, LSTMState
from comic_tpu.models.decoder import (
    DecoderConfig,
    decoder_init,
    embed_ids,
    initial_state,
    step,
    teacher_forced,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestLayers:
    def test_dense_no_bias(self, rng):
        key = jax.random.PRNGKey(0)
        p = layers.dense_init(key, 4, 3, use_bias=False)
        x = rng.normal(size=(2, 4)).astype(np.float32)
        np.testing.assert_allclose(
            layers.dense_apply(p, x), x @ np.asarray(p["kernel"]), rtol=1e-5)

    def test_layer_norm_golden(self, rng):
        x = rng.normal(size=(2, 8)).astype(np.float32)
        p = layers.layer_norm_init(8)
        got = layers.layer_norm_apply(p, x, activation=jnp.tanh)
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        want = np.tanh((x - mu) / np.sqrt(var + 1e-12))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_split_combine_heads_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
        y = layers.split_heads(x, 4)
        assert y.shape == (2, 4, 5, 2)
        np.testing.assert_allclose(layers.combine_heads(y), x)

    def test_l2_loss(self):
        params = {"a": jnp.ones((2, 2)), "b": jnp.full((3,), 2.0)}
        # 1e-2 * (4*0.5 + 3*4*0.5) = 1e-2 * 8
        np.testing.assert_allclose(layers.l2_loss(params, 1e-2), 0.08, rtol=1e-6)

    def test_count_params(self):
        params = {"a": jnp.ones((2, 3)), "nested": {"b": jnp.ones((4,))}}
        assert layers.count_params(params) == 10


class TestCells:
    def test_lstm_golden_vs_numpy(self, rng):
        cell = Cell("LSTM", 3, 4)
        p = cell.init(jax.random.PRNGKey(1))
        x = rng.normal(size=(2, 3)).astype(np.float32)
        c0 = rng.normal(size=(2, 4)).astype(np.float32)
        h0 = rng.normal(size=(2, 4)).astype(np.float32)
        out, st = cell.step(p, x, LSTMState(jnp.asarray(c0), jnp.asarray(h0)))

        k = np.asarray(p["kernel"])
        gates = np.concatenate([x, h0], -1) @ k + np.asarray(p["bias"])
        i, j, f, o = np.split(gates, 4, -1)
        c1 = c0 * _sigmoid(f + 1.0) + _sigmoid(i) * np.tanh(j)
        h1 = np.tanh(c1) * _sigmoid(o)
        np.testing.assert_allclose(st.c, c1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out, h1, rtol=1e-4, atol=1e-5)

    def test_gru_golden_vs_numpy(self, rng):
        cell = Cell("GRU", 3, 4)
        p = cell.init(jax.random.PRNGKey(2))
        x = rng.normal(size=(2, 3)).astype(np.float32)
        h0 = rng.normal(size=(2, 4)).astype(np.float32)
        out, h1 = cell.step(p, x, jnp.asarray(h0))

        gates = _sigmoid(
            np.concatenate([x, h0], -1) @ np.asarray(p["gate_kernel"])
            + np.asarray(p["gate_bias"]))
        r, u = np.split(gates, 2, -1)
        c = np.tanh(np.concatenate([x, r * h0], -1) @ np.asarray(p["cand_kernel"])
                    + np.asarray(p["cand_bias"]))
        want = u * h0 + (1 - u) * c
        np.testing.assert_allclose(h1, want, rtol=1e-4, atol=1e-5)

    def test_ln_lstm_shapes(self):
        cell = Cell("LN_LSTM", 3, 4)
        p = cell.init(jax.random.PRNGKey(3))
        out, st = cell.step(p, jnp.ones((2, 3)), cell.zero_state(2))
        assert out.shape == (2, 4) and st.c.shape == (2, 4)

    def test_invalid_cell(self):
        with pytest.raises(ValueError):
            Cell("RNN", 3, 4)


def _attn_cfg(**kw):
    d = dict(num_units=8, num_heads=2, memory_channels=6,
             alignment="add_LN", probability="softmax", fm_projection="tied")
    d.update(kw)
    return AttentionConfig(**d)


class TestAttention:
    def test_add_ln_golden(self, rng):
        cfg = _attn_cfg()
        p = attention_init(jax.random.PRNGKey(4), cfg)
        fm = rng.normal(size=(2, 5, 6)).astype(np.float32)
        q = rng.normal(size=(2, 8)).astype(np.float32)
        mem = precompute(p, cfg, jnp.asarray(fm))
        ctx, align = attend(p, cfg, jnp.asarray(q), mem)

        keys = fm @ np.asarray(p["memory_layer"]["kernel"])  # (2,5,8)
        pq = q @ np.asarray(p["query_layer"]["kernel"])  # (2,8)
        s = keys + pq[:, None, :]
        mu, var = s.mean(-1, keepdims=True), s.var(-1, keepdims=True)
        s = np.tanh((s - mu) / np.sqrt(var + 1e-12))
        s = s * np.asarray(p["v"])
        # split into 2 heads of 4 channels, sum channels
        s = s.reshape(2, 5, 2, 4).transpose(0, 2, 1, 3).sum(-1)  # (2,2,5)
        s = s / 5.0  # temperature init
        e = np.exp(s - s.max(-1, keepdims=True))
        want_align = e / e.sum(-1, keepdims=True)
        np.testing.assert_allclose(align, want_align, rtol=1e-4, atol=1e-5)

        vals = keys.reshape(2, 5, 2, 4).transpose(0, 2, 1, 3)  # tied
        want_ctx = np.einsum("bhl,bhld->bhd", want_align, vals).reshape(2, 8)
        np.testing.assert_allclose(ctx, want_ctx, rtol=1e-4, atol=1e-5)

    def test_alignments_are_probabilities(self, rng):
        for prob in ("softmax", "sigmoid"):
            cfg = _attn_cfg(probability=prob)
            p = attention_init(jax.random.PRNGKey(5), cfg)
            fm = jnp.asarray(rng.normal(size=(3, 5, 6)).astype(np.float32))
            mem = precompute(p, cfg, fm)
            _, align = attend(p, cfg, jnp.zeros((3, 8)), mem)
            np.testing.assert_allclose(align.sum(-1), np.ones((3, 2)), rtol=1e-5)

    def test_dot_alignment(self, rng):
        cfg = _attn_cfg(alignment="dot")
        p = attention_init(jax.random.PRNGKey(6), cfg)
        fm = jnp.asarray(rng.normal(size=(2, 5, 6)).astype(np.float32))
        mem = precompute(p, cfg, fm)
        ctx, align = attend(p, cfg, jnp.ones((2, 8)), mem)
        assert ctx.shape == (2, 8) and align.shape == (2, 2, 5)

    def test_fm_projection_none_context_size(self, rng):
        cfg = _attn_cfg(fm_projection=None, memory_channels=6,
                        num_heads=2)
        assert cfg.context_size == 6
        p = attention_init(jax.random.PRNGKey(7), cfg)
        fm = jnp.asarray(rng.normal(size=(2, 5, 6)).astype(np.float32))
        mem = precompute(p, cfg, fm)
        ctx, _ = attend(p, cfg, jnp.ones((2, 8)), mem)
        assert ctx.shape == (2, 6)

    def test_independent_projection(self, rng):
        cfg = _attn_cfg(fm_projection="independent")
        p = attention_init(jax.random.PRNGKey(8), cfg)
        assert "value_layer" in p
        fm = jnp.asarray(rng.normal(size=(2, 5, 6)).astype(np.float32))
        mem = precompute(p, cfg, fm)
        assert mem.values.shape == (2, 2, 5, 4)


def _dec_cfg(**kw):
    attn = kw.pop("attention", None) or AttentionConfig(
        num_units=16, num_heads=2, memory_channels=12, fm_projection="tied")
    d = dict(token_type="radix", softmax_size=10, rnn_name="LSTM",
             rnn_size=16, word_size=8, init_method="first_input",
             image_embed_size=20, attention=attn, start_id=8, end_id=9)
    d.update(kw)
    return DecoderConfig(**d)


class TestDecoder:
    def test_embed_onehot_vs_gather(self):
        cfg = _dec_cfg()
        p = decoder_init(jax.random.PRNGKey(9), cfg)
        ids = jnp.asarray([[1, 2, -1]])
        e = embed_ids(p, cfg, ids)
        # PAD (-1) embeds to zeros via one-hot
        np.testing.assert_allclose(e[0, 2], np.zeros(8), atol=1e-6)
        np.testing.assert_allclose(e[0, 0], np.asarray(p["embedding"])[1],
                                   rtol=1e-5)

    def test_word_embed_clips_pad(self):
        cfg = _dec_cfg(token_type="word")
        p = decoder_init(jax.random.PRNGKey(10), cfg)
        e = embed_ids(p, cfg, jnp.asarray([[-1]]))
        np.testing.assert_allclose(e[0, 0], np.asarray(p["embedding"])[0],
                                   rtol=1e-5)

    def test_teacher_forced_shapes(self, rng):
        cfg = _dec_cfg()
        p = decoder_init(jax.random.PRNGKey(11), cfg)
        B, T, L = 3, 7, 5
        inputs = jnp.asarray(rng.integers(0, 10, size=(B, T)))
        im = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))
        fm = jnp.asarray(rng.normal(size=(B, L, 12)).astype(np.float32))
        logits, align = teacher_forced(p, cfg, inputs, im, fm)
        assert logits.shape == (B, T, 10)
        assert align.shape == (B, T, 2, L)

    def test_scan_matches_manual_steps(self, rng):
        from comic_tpu.models.attention import precompute as pre
        cfg = _dec_cfg()
        p = decoder_init(jax.random.PRNGKey(12), cfg)
        B, T, L = 2, 4, 5
        inputs = jnp.asarray(rng.integers(0, 10, size=(B, T)))
        im = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))
        fm = jnp.asarray(rng.normal(size=(B, L, 12)).astype(np.float32))
        logits, _ = teacher_forced(p, cfg, inputs, im, fm)

        mem = pre(p["attention"], cfg.attention, fm)
        st = initial_state(p, cfg, im)
        outs = []
        for t in range(T):
            wv = embed_ids(p, cfg, inputs[:, t])
            lg, _, st = step(p, cfg, wv, st, mem)
            outs.append(lg)
        manual = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(logits, manual, rtol=1e-4, atol=1e-5)

    def test_project_hidden_init(self, rng):
        cfg = _dec_cfg(init_method="project_hidden")
        p = decoder_init(jax.random.PRNGKey(13), cfg)
        st = initial_state(p, cfg, jnp.ones((2, 20)))
        np.testing.assert_allclose(st.cell_state.c, np.zeros((2, 16)))
        assert st.cell_state.h.shape == (2, 16)

    def test_dropout_changes_output_only_in_training(self, rng):
        cfg = _dec_cfg()
        p = decoder_init(jax.random.PRNGKey(14), cfg)
        B, T, L = 2, 4, 5
        inputs = jnp.asarray(rng.integers(0, 10, size=(B, T)))
        im = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))
        fm = jnp.asarray(rng.normal(size=(B, L, 12)).astype(np.float32))
        l1, _ = teacher_forced(p, cfg, inputs, im, fm)
        l2, _ = teacher_forced(p, cfg, inputs, im, fm)
        np.testing.assert_allclose(l1, l2)  # eval is deterministic
        lt, _ = teacher_forced(p, cfg, inputs, im, fm,
                               rng=jax.random.PRNGKey(0), training=True)
        assert not np.allclose(l1, lt)


class TestParamCounts:
    """Decoder parameter counts must reproduce the README table
    (README.md:221-222 — 12.7M baseline, 4.3M COMIC-256)."""

    def test_comic256_is_4p3M(self):
        attn = AttentionConfig(num_units=512, num_heads=8,
                               memory_channels=832, fm_projection="tied")
        cfg = DecoderConfig(
            token_type="radix", softmax_size=258, rnn_name="LSTM",
            rnn_size=512, word_size=256, init_method="first_input",
            image_embed_size=1024, attention=attn, start_id=256, end_id=257)
        p = decoder_init(jax.random.PRNGKey(0), cfg)
        n = layers.count_params(p)
        assert abs(n - 4.3e6) < 0.1e6, n

    def test_baseline_word_is_12p7M(self):
        attn = AttentionConfig(num_units=512, num_heads=1,
                               memory_channels=832, fm_projection=None)
        cfg = DecoderConfig(
            token_type="word", softmax_size=9962, rnn_name="LSTM",
            rnn_size=512, word_size=256, init_method="first_input",
            image_embed_size=1024, attention=attn, start_id=9960, end_id=9961)
        p = decoder_init(jax.random.PRNGKey(0), cfg)
        n = layers.count_params(p)
        assert abs(n - 12.7e6) < 0.15e6, n


class TestVariationalDropout:
    def test_recurrent_dropout_runs_and_differs(self, rng):
        cfg = _dec_cfg()._replace(recurrent_dropout=True, dropout_in=0.5)
        p = decoder_init(jax.random.PRNGKey(20), cfg)
        B, T, L = 2, 5, 4
        inputs = jnp.asarray(rng.integers(0, 10, size=(B, T)))
        im = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))
        fm = jnp.asarray(rng.normal(size=(B, L, 12)).astype(np.float32))
        l_eval, _ = teacher_forced(p, cfg, inputs, im, fm)
        l_tr, _ = teacher_forced(p, cfg, inputs, im, fm,
                                 rng=jax.random.PRNGKey(0), training=True)
        assert not np.allclose(np.asarray(l_eval), np.asarray(l_tr))
