"""Multi-head visual attention over CNN feature maps.

Functional re-design of the reference attention stack
(/root/reference/common/ops_rnn.py:403-632 MultiHeadAttV3 / MultiHeadAddLN /
MultiHeadAdd / MultiHeadDot): keys/values are projected ONCE per image
(`precompute`), and the per-token scoring step is a tiny pure function meant
to live inside a `lax.scan` / `lax.while_loop` decode body. No wrapper-class
state machinery — the decoder carries (keys, values) as loop-invariant
arrays.

Score functions:
  - add_LN (the COMIC default): score_h = sum_c v ⊙ LN_tanh(keys + Wq q),
    per head, divided by a learned scalar temperature (init 5.0)
    (ops_rnn.py:523-565).
  - add: same without the LayerNorm (ops_rnn.py:568-600).
  - dot: scaled dot-product (ops_rnn.py:603-632).
Probability functions: softmax or normalized sigmoid `_signorm`
(model_base.py:598-603).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import (
    dense_apply,
    dense_init,
    layer_norm_apply,
    layer_norm_init,
    split_heads,
    xavier_uniform,
)

Params = Dict[str, Any]


class AttentionConfig(NamedTuple):
    num_units: int  # attention depth (== rnn_size in the reference)
    num_heads: int
    memory_channels: int  # CNN feature-map channel count
    alignment: str = "add_LN"  # add_LN | add | dot
    probability: str = "softmax"  # softmax | sigmoid
    fm_projection: Optional[str] = "tied"  # None | 'tied' | 'independent'
    context_layer: bool = False  # extra linear on the context vector
    scale: bool = True  # learned softmax temperature (add variants)

    @property
    def context_size(self) -> int:
        """Size of the attention context fed back to the RNN input.

        Raw feature-map channels when no projection and no context layer,
        else num_units (model_base.py:610-613, ops_rnn.py:775-779).
        """
        if self.fm_projection is None and not self.context_layer:
            return self.memory_channels
        return self.num_units


class AttentionMemory(NamedTuple):
    """Per-image precomputed tensors (loop-invariant during decode).

    For the add_LN alignment, `key_mean`/`key_m2` carry the per-position
    first/second moments of the keys over channels (float32), letting the
    decode step compute LayerNorm statistics of (keys + query) in closed
    form instead of two brute-force reduction passes over (B, K, L, U):
      mean(k+q)   = mean(k) + mean(q)
      E[(k+q)^2]  = E[k^2] + 2 E[k*q] + E[q^2],  E[k*q] = one MXU matmul.
    """

    keys: jnp.ndarray  # (B, L, U)
    values: jnp.ndarray  # (B, H, L, D) split into heads
    key_mean: Optional[jnp.ndarray] = None  # (B, L) f32
    key_m2: Optional[jnp.ndarray] = None  # (B, L) f32 mean of k^2


def attention_init(key, cfg: AttentionConfig, init=xavier_uniform) -> Params:
    ks = jax.random.split(key, 4)
    p: Params = {
        "query_layer": dense_init(ks[0], cfg.num_units, cfg.num_units,
                                  use_bias=False, init=init),
        "memory_layer": dense_init(ks[1], cfg.memory_channels, cfg.num_units,
                                   use_bias=False, init=init),
    }
    if cfg.alignment in ("add_LN", "add"):
        p["v"] = init(ks[2], (cfg.num_units,))
        if cfg.alignment == "add_LN":
            p["ln"] = layer_norm_init(cfg.num_units)
            # learned temperature belongs to MultiHeadAddLN ONLY
            # (ops_rnn.py:554-563); MultiHeadAdd (ops_rnn.py:568-600) has
            # no scaling — creating one here would also break param-tree
            # parity for checkpoint conversion of 'add' models
            if cfg.scale:
                p["softmax_temperature"] = jnp.float32(5.0)
    if cfg.fm_projection == "independent":
        p["value_layer"] = dense_init(ks[3], cfg.memory_channels, cfg.num_units,
                                      use_bias=False, init=init)
    if cfg.context_layer:
        context_in = (cfg.memory_channels if cfg.fm_projection is None
                      else cfg.num_units)
        p["a_layer"] = dense_init(
            jax.random.fold_in(key, 7), context_in, cfg.num_units,
            use_bias=False, init=init)
    return p


def precompute(p: Params, cfg: AttentionConfig, feature_map: jnp.ndarray,
               dtype=None) -> AttentionMemory:
    """Project the (B, L, C) feature map into keys and per-head values.

    One batched matmul per image instead of per decode step — the reference
    gets this from contrib's memory_layer applied at mechanism construction
    (ops_rnn.py:440-447); here it is explicit.

    With a compute dtype set, keys/values are STORED in that dtype: the
    decode loop re-reads them from HBM every step, so halving their width
    (bfloat16) halves the dominant memory traffic of the decode phase.

    For add_LN the per-position key moments are also precomputed (from the
    stored keys, so the decode-step math sees the same rounded values) —
    see AttentionMemory.
    """
    store = (lambda x: x.astype(dtype)) if dtype is not None else (lambda x: x)
    keys = store(dense_apply(p["memory_layer"], feature_map, dtype=dtype))
    key_mean = key_m2 = None
    if cfg.alignment == "add_LN":
        k32 = keys.astype(jnp.float32)
        key_mean = jnp.mean(k32, axis=-1)
        key_m2 = jnp.mean(jnp.square(k32), axis=-1)
    if cfg.fm_projection == "tied":
        values = split_heads(keys, cfg.num_heads)
    elif cfg.fm_projection == "independent":
        values = split_heads(
            store(dense_apply(p["value_layer"], feature_map, dtype=dtype)),
            cfg.num_heads)
    elif cfg.fm_projection is None:
        if cfg.memory_channels % cfg.num_heads != 0:
            raise ValueError(
                "For `none` projection the channel dim must divide num_heads")
        values = split_heads(store(feature_map), cfg.num_heads)
    else:
        raise ValueError(f"Invalid fm_projection: {cfg.fm_projection}")
    return AttentionMemory(keys=keys, values=values,
                           key_mean=key_mean, key_m2=key_m2)


LN_EPS = 1e-12  # contrib layer_norm default (layers.layer_norm_apply)


def _add_ln_scores_fast(p: Params, cfg: AttentionConfig, memory:
                        AttentionMemory, proj_q: jnp.ndarray) -> jnp.ndarray:
    """add_LN head scores (B, K, H, L) via precomputed key moments.

    Computes LayerNorm(keys + q) statistics in closed form:
      mean(k+q) = mean_c(k) + mean_c(q)
      E[(k+q)^2] = E[k^2] + 2 E[k q] + E[q^2]
    where E[k q] over channels is ONE batched MXU matmul (keys @ q^T) and
    the key moments come precomputed from `precompute`. This removes the
    two brute-force reduction passes over the (B, K, L, U) sum that the
    direct LayerNorm needs, leaving a single elementwise pass (the tanh)
    that reads the keys exactly once — the decode loop's dominant VPU and
    HBM cost (CLAUDE.md perf notes). Numerically equal to
    layer_norm_apply up to f32 rounding (moments and normalization both
    accumulate in f32).

    proj_q: (B, K, U) query projections (K = queries per image; 1 for the
    flat path).
    """
    keys = memory.keys  # (B, L, U)
    u = keys.shape[-1]
    q32 = proj_q.astype(jnp.float32)
    mu_q = jnp.mean(q32, axis=-1)  # (B, K)
    m2_q = jnp.mean(jnp.square(q32), axis=-1)  # (B, K)
    cross = jnp.einsum("blu,bku->bkl", keys, proj_q.astype(keys.dtype),
                       preferred_element_type=jnp.float32)  # (B, K, L)
    mu = memory.key_mean[:, None, :] + mu_q[:, :, None]  # (B, K, L)
    ex2 = memory.key_m2[:, None, :] + 2.0 * cross / u + m2_q[:, :, None]
    var = jnp.maximum(ex2 - jnp.square(mu), 0.0)
    inv = jax.lax.rsqrt(var + LN_EPS)  # (B, K, L)

    x = (keys[:, None].astype(jnp.float32)
         + q32[:, :, None, :])  # (B, K, L, U)
    g = p["ln"]["scale"]
    beta = p["ln"]["bias"]
    # fold v into the LN affine: v * (g*(x-mu)*inv + beta) pre-tanh is NOT
    # valid (tanh between); apply v after tanh, then head-sum.
    y = jnp.tanh((x - mu[..., None]) * inv[..., None] * g + beta)
    y = y * p["v"]
    b, k, l, _ = y.shape
    score = jnp.sum(y.reshape(b, k, l, cfg.num_heads, u // cfg.num_heads),
                    axis=4)  # (B, K, L, H) f32
    score = jnp.transpose(score, (0, 1, 3, 2))  # (B, K, H, L)
    if cfg.scale:
        score = score / p["softmax_temperature"]
    return score


def _probability(cfg: AttentionConfig, score: jnp.ndarray) -> jnp.ndarray:
    if cfg.probability == "softmax":
        return jax.nn.softmax(score, axis=-1)
    if cfg.probability == "sigmoid":
        s = jax.nn.sigmoid(score)
        return s / jnp.sum(s, axis=-1, keepdims=True)
    raise ValueError(f"Invalid probability fn: {cfg.probability}")


def attend(p: Params, cfg: AttentionConfig, query: jnp.ndarray,
           memory: AttentionMemory, dtype=None,
           alignments_dropout_key: Optional[jax.Array] = None,
           alignments_keep_prob: float = 1.0,
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One attention step.

    Args:
      query: (B, U) decoder hidden state.
      memory: precomputed keys/values.
    Returns:
      (context, alignments): context (B, context_size); alignments (B, H, L).
    """
    proj_q = dense_apply(p["query_layer"], query, dtype=dtype)[:, None, :]
    # keep the big (B, L, U) score chain in the keys' storage dtype
    # (bfloat16 under a compute dtype); reductions accumulate in f32
    proj_q = proj_q.astype(memory.keys.dtype)
    if cfg.alignment == "add_LN" and memory.key_mean is not None:
        # closed-form LN statistics (see _add_ln_scores_fast)
        score = _add_ln_scores_fast(p, cfg, memory, proj_q)[:, 0]  # (B,H,L)
    elif cfg.alignment in ("add_LN", "add"):
        score = memory.keys + proj_q  # (B, L, U)
        if cfg.alignment == "add_LN":
            score = layer_norm_apply(p["ln"], score, activation=jnp.tanh)
        else:
            score = jnp.tanh(score)
        score = score * p["v"].astype(score.dtype)
        score = jnp.sum(split_heads(score, cfg.num_heads), axis=3,
                        dtype=jnp.float32)  # (B, H, L)
        if cfg.scale and cfg.alignment == "add_LN":
            score = score / p["softmax_temperature"]
    elif cfg.alignment == "dot":
        score = memory.keys * proj_q
        score = jnp.sum(split_heads(score, cfg.num_heads), axis=3,
                        dtype=jnp.float32)
        score = score / jnp.sqrt(jnp.float32(cfg.num_units / cfg.num_heads))
    else:
        raise ValueError(f"Invalid alignment method: {cfg.alignment}")

    alignments = _probability(cfg, score)  # (B, H, L)

    # Attention-map dropout INSIDE the step, train-time only
    # (ops_rnn.py:696-701; keep prob 0.9 by default).
    attn_for_context = alignments
    if alignments_dropout_key is not None and alignments_keep_prob < 1.0:
        mask = jax.random.bernoulli(
            alignments_dropout_key, alignments_keep_prob, alignments.shape)
        attn_for_context = jnp.where(
            mask, alignments / alignments_keep_prob, 0.0)

    # context_h = alignments_h @ values_h  -> (B, H, D) -> (B, H*D)
    context = jnp.einsum(
        "bhl,bhld->bhd",
        attn_for_context.astype(memory.values.dtype), memory.values,
        preferred_element_type=jnp.float32)
    # head-major flatten, same layout as combine_heads on (B, H, 1, D)
    context = context.reshape(context.shape[0], -1)
    if cfg.context_layer:
        context = dense_apply(p["a_layer"], context, dtype=dtype)
    # Return the DROPPED alignments: the reference applies attention-map
    # dropout before BOTH the context matmul and the alignment_history
    # write (ops_rnn.py:696-745), and the history is what feeds the
    # doubly-stochastic map loss (model_base.py:355-365) — recording the
    # clean maps would regularize a different quantity than the reference.
    # Inference passes no dropout key, so the two are identical there.
    return context.astype(jnp.float32), attn_for_context


def attend_grouped(p: Params, cfg: AttentionConfig, query: jnp.ndarray,
                   memory: AttentionMemory, dtype=None,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-grouped attention step: K queries per image share one memory.

    Args:
      query: (B, K, U) — K beam hypotheses per image.
      memory: UNtiled per-image keys/values ((B, L, U) / (B, H, L, D)).
    Returns:
      (context (B, K, context_size), alignments (B, K, H, L)).

    Mathematically identical to `attend` on beam-tiled memory, but the keys
    and values are READ once per image instead of once per hypothesis — the
    decode loop is memory-bound on exactly these reads, so this cuts the
    dominant traffic by the beam width.
    """
    b, k, _ = query.shape
    proj_q = dense_apply(p["query_layer"], query, dtype=dtype)
    proj_q = proj_q.astype(memory.keys.dtype)
    keys = memory.keys[:, None]  # (B, 1, L, U)
    if cfg.alignment == "add_LN" and memory.key_mean is not None:
        # closed-form LN statistics (see _add_ln_scores_fast)
        score = _add_ln_scores_fast(p, cfg, memory, proj_q)  # (B, K, H, L)
    elif cfg.alignment in ("add_LN", "add"):
        score = keys + proj_q[:, :, None, :]  # (B, K, L, U)
        if cfg.alignment == "add_LN":
            score = layer_norm_apply(p["ln"], score, activation=jnp.tanh)
        else:
            score = jnp.tanh(score)
        score = score * p["v"].astype(score.dtype)
        l, u = score.shape[2], score.shape[3]
        score = jnp.sum(
            score.reshape(b, k, l, cfg.num_heads, u // cfg.num_heads),
            axis=4, dtype=jnp.float32)  # (B, K, L, H)
        score = jnp.transpose(score, (0, 1, 3, 2))  # (B, K, H, L)
        if cfg.scale and cfg.alignment == "add_LN":
            score = score / p["softmax_temperature"]
    elif cfg.alignment == "dot":
        score = keys * proj_q[:, :, None, :]
        l, u = score.shape[2], score.shape[3]
        score = jnp.sum(
            score.reshape(b, k, l, cfg.num_heads, u // cfg.num_heads),
            axis=4, dtype=jnp.float32)
        score = jnp.transpose(score, (0, 1, 3, 2))
        score = score / jnp.sqrt(jnp.float32(cfg.num_units / cfg.num_heads))
    else:
        raise ValueError(f"Invalid alignment method: {cfg.alignment}")

    alignments = _probability(cfg, score)  # (B, K, H, L)
    context = jnp.einsum(
        "bkhl,bhld->bkhd",
        alignments.astype(memory.values.dtype), memory.values,
        preferred_element_type=jnp.float32)
    context = context.reshape(b, k, -1)
    if cfg.context_layer:
        context = dense_apply(p["a_layer"], context, dtype=dtype)
    return context.astype(jnp.float32), alignments
