"""Pallas fused-attention kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.models.attention import (
    AttentionConfig,
    AttentionMemory,
    attend,
    attend_grouped,
    attention_init,
    precompute,
)
from comic_tpu.models.layers import dense_apply, split_heads
from comic_tpu.ops.fused_attention import fused_add_ln_attention


class TestFusedAttentionKernel:
    def _setup(self, rows=5, L=7, U=16, H=4, seed=0):
        cfg = AttentionConfig(num_units=U, num_heads=H, memory_channels=12,
                              fm_projection="tied")
        p = attention_init(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        fm = jnp.asarray(rng.normal(size=(rows, L, 12)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(rows, U)).astype(np.float32))
        mem = precompute(p, cfg, fm)
        return cfg, p, q, mem

    def test_matches_jnp_attend(self):
        cfg, p, q, mem = self._setup()
        ctx_ref, align_ref = attend(p, cfg, q, mem)
        pq = dense_apply(p["query_layer"], q)
        ctx, align = fused_add_ln_attention(
            pq, mem.keys, p["v"], p["ln"]["scale"], p["ln"]["bias"],
            p["softmax_temperature"], num_heads=cfg.num_heads,
            interpret=True)
        np.testing.assert_allclose(align, align_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ctx, ctx_ref, rtol=1e-5, atol=1e-6)

    def test_row_padding(self):
        # rows not a multiple of the 8-row tile get padded and trimmed
        cfg, p, q, mem = self._setup(rows=3)
        pq = dense_apply(p["query_layer"], q)
        ctx, align = fused_add_ln_attention(
            pq, mem.keys, p["v"], p["ln"]["scale"], p["ln"]["bias"],
            p["softmax_temperature"], num_heads=cfg.num_heads,
            interpret=True)
        assert ctx.shape == (3, 16) and align.shape == (3, 4, 7)

    def test_bf16_keys(self):
        cfg, p, q, mem = self._setup()
        keys16 = mem.keys.astype(jnp.bfloat16)
        pq = dense_apply(p["query_layer"], q)
        ctx, align = fused_add_ln_attention(
            pq, keys16, p["v"], p["ln"]["scale"], p["ln"]["bias"],
            p["softmax_temperature"], num_heads=cfg.num_heads,
            interpret=True)
        ctx_ref, align_ref = attend(
            p, cfg, q, AttentionMemory(keys16, split_heads(keys16, 4)))
        np.testing.assert_allclose(align, align_ref, rtol=2e-2, atol=2e-3)


class TestGroupedPallasKernel:
    def test_matches_attend_grouped(self):
        """Interpreter-mode numerics of the (negative-result) beam-grouped
        kernel vs the production XLA path."""
        from comic_tpu.ops.grouped_attention import grouped_add_ln_attention

        B, K, L, U, H = 3, 3, 7, 16, 4
        cfg = AttentionConfig(num_units=U, num_heads=H, memory_channels=12,
                              fm_projection="tied")
        p = attention_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        fm = jnp.asarray(rng.normal(size=(B, L, 12)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(B, K, U)).astype(np.float32))
        mem = precompute(p, cfg, fm)
        ctx_ref, align_ref = attend_grouped(p, cfg, q, mem)
        pq = dense_apply(p["query_layer"], q)
        ctx, align = grouped_add_ln_attention(
            pq, mem.keys, mem.key_mean, mem.key_m2, p["v"],
            p["ln"]["scale"], p["ln"]["bias"], p["softmax_temperature"],
            num_heads=H, interpret=True)
        np.testing.assert_allclose(align, align_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ctx, ctx_ref, rtol=1e-5, atol=1e-6)


class TestGroupedAttention:
    def test_grouped_equals_tiled_flat(self):
        """attend_grouped on untiled memory == attend on beam-tiled memory."""
        B, K, L, U, H = 3, 4, 6, 16, 4
        cfg = AttentionConfig(num_units=U, num_heads=H, memory_channels=12,
                              fm_projection="tied")
        p = attention_init(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(1)
        fm = jnp.asarray(rng.normal(size=(B, L, 12)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(B, K, U)).astype(np.float32))
        mem = precompute(p, cfg, fm)

        ctx_g, align_g = attend_grouped(p, cfg, q, mem)

        tiled = AttentionMemory(jnp.repeat(mem.keys, K, 0),
                                jnp.repeat(mem.values, K, 0))
        ctx_f, align_f = attend(p, cfg, q.reshape(B * K, U), tiled)
        np.testing.assert_allclose(
            np.asarray(ctx_g).reshape(B * K, -1), ctx_f, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(align_g).reshape(B * K, H, L), align_f,
            rtol=1e-5, atol=1e-6)

    def test_grouped_sigmoid_and_dot(self):
        B, K, L, U, H = 2, 3, 5, 8, 2
        for align_m, prob in (("dot", "softmax"), ("add_LN", "sigmoid")):
            cfg = AttentionConfig(num_units=U, num_heads=H,
                                  memory_channels=8, fm_projection="tied",
                                  alignment=align_m, probability=prob)
            p = attention_init(jax.random.PRNGKey(2), cfg)
            rng = np.random.default_rng(2)
            fm = jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32))
            q = jnp.asarray(rng.normal(size=(B, K, U)).astype(np.float32))
            mem = precompute(p, cfg, fm)
            ctx_g, align_g = attend_grouped(p, cfg, q, mem)
            tiled = AttentionMemory(jnp.repeat(mem.keys, K, 0),
                                    jnp.repeat(mem.values, K, 0))
            ctx_f, align_f = attend(p, cfg, q.reshape(B * K, U), tiled)
            np.testing.assert_allclose(
                np.asarray(align_g).reshape(B * K, H, L), align_f,
                rtol=1e-5, atol=1e-6)


class TestAddLnTfTwin:
    def test_attend_matches_raw_tf_twin(self):
        """Independent golden for the COMIC attention: the whole add_LN
        score chain (memory/query projections, contrib layer_norm with
        learnable scale/center at eps 1e-12, tanh, v-weighting, contiguous
        head split, per-head channel sum, learned temperature, softmax,
        tied-value context) rebuilt from raw tf ops
        (ops_rnn.py:523-565, ops.py:241-280)."""
        tf = pytest.importorskip("tensorflow")
        from comic_tpu.models.attention import (AttentionConfig,
                                                attention_init, attend,
                                                precompute)

        cfg = AttentionConfig(num_units=32, num_heads=4,
                              memory_channels=24, fm_projection="tied")
        rng = np.random.default_rng(11)
        p = attention_init(jax.random.PRNGKey(2), cfg)
        p = jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.normal(0, 0.4, a.shape), jnp.float32),
            p)
        p["softmax_temperature"] = jnp.float32(3.7)
        B, L = 3, 10
        fmap = rng.normal(size=(B, L, 24)).astype(np.float32)
        query = rng.normal(size=(B, 32)).astype(np.float32)

        mem = precompute(p, cfg, jnp.asarray(fmap))
        assert mem.key_mean is not None  # closed-form LN path active
        ctx, align = attend(p, cfg, jnp.asarray(query), mem)

        pn = jax.tree_util.tree_map(np.asarray, p)
        keys = tf.matmul(fmap, pn["memory_layer"]["kernel"])
        pq = tf.matmul(query, pn["query_layer"]["kernel"])
        s = keys + pq[:, None, :]
        mu = tf.reduce_mean(s, -1, keepdims=True)
        var = tf.reduce_mean(tf.square(s - mu), -1, keepdims=True)
        s = tf.tanh((s - mu) / tf.sqrt(var + 1e-12) * pn["ln"]["scale"]
                    + pn["ln"]["bias"])
        s = s * pn["v"]
        H, Uh = 4, 8
        score = tf.transpose(tf.reshape(s, (B, L, H, Uh)), (0, 2, 1, 3))
        score = tf.reduce_sum(score, axis=3) / pn["softmax_temperature"]
        align_tf = tf.nn.softmax(score, axis=-1)  # (B, H, L)
        values = tf.transpose(tf.reshape(keys, (B, L, H, Uh)), (0, 2, 1, 3))
        ctx_tf = tf.reshape(tf.einsum("bhl,bhld->bhd", align_tf, values),
                            (B, H * Uh))

        np.testing.assert_allclose(np.asarray(align), align_tf.numpy(),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ctx), ctx_tf.numpy(),
                                   rtol=1e-4, atol=1e-5)
