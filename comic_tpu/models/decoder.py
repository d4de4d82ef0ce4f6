"""Attention-LSTM caption decoder.

TPU-first re-design of the reference decoder stack
(/root/reference/src/model_base.py:109-314,531-757 and
/root/reference/common/ops_rnn.py:635-803 MultiHeadAttentionWrapperV3):

  - the per-token step is one pure function `step` (cell + attention +
    logits) whose state is a small pytree — no wrapper classes;
  - teacher-forced training decode is a single `lax.scan` over time with the
    attention keys/values precomputed once per image;
  - the word embedding doubles as a matmul for the tiny radix/char vocabs
    (one-hot @ matrix, model_base.py:574-594) and a gather for word vocabs;
  - the softmax projection is a Dense(softmax_size) on the cell output.

Layout invariant: everything is batch-major. The reference's time-major
TensorArrays do not exist here; alignment history comes out of the scan as a
(B, T, H, L) array.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .attention import (
    AttentionConfig,
    AttentionMemory,
    attend,
    attention_init,
    precompute,
)
from .cells import Cell, apply_dropout
from .layers import dense_apply, dense_init, get_initializer

Params = Dict[str, Any]

# Scan-body remat policy for training decodes (see teacher_forced).
# r3 sweep on the v5e (tools/remat_sweep.py), SCST 70 rows T=42 / XE b32:
#   dots_saveable          20.3 / 8.3 ms   <- default (also saves the small
#                                             batched attention dots)
#   dots_no_batch_dims     20.7 / 8.6 ms
#   nothing_saveable       20.6 / 8.6 ms
#   everything_saveable    49.9 / 16.1 ms  (no remat: backward HBM-bound)
# The three remat variants are within ~2% — the step is at its
# recompute-vs-HBM floor; only turning remat off is catastrophic.
REMAT_POLICY = jax.checkpoint_policies.dots_saveable


class DecoderConfig(NamedTuple):
    token_type: str  # radix | word | char
    softmax_size: int  # radix_base + 2 for radix, len(itow) otherwise
    rnn_name: str = "LSTM"
    rnn_size: int = 512
    word_size: int = 256
    init_method: str = "first_input"  # first_input | project_hidden
    image_embed_size: int = 1024  # pooled CNN feature size
    attention: AttentionConfig = None
    # dropout (train-time)
    dropout_in: float = 0.35
    dropout_out: float = 0.35
    recurrent_dropout: bool = False
    attn_keep_prob: float = 0.9
    # special token ids in the decode plane (model_base.py:700-707)
    start_id: int = 256
    end_id: int = 257
    # weight initialiser ('xavier' | 'he' | 'none', train.py --initialiser)
    initialiser: str = "xavier"

    @property
    def rnn_input_size(self) -> int:
        return self.word_size + self.attention.context_size


class DecoderState(NamedTuple):
    """Carried through every decode step."""

    cell_state: Any  # LSTMState or array (GRU)
    attention: jnp.ndarray  # (B, context_size) previous context vector


def decoder_init(key, cfg: DecoderConfig) -> Params:
    """Build the decoder parameter pytree."""
    init = get_initializer(cfg.initialiser)
    ks = jax.random.split(key, 6)
    cell = Cell(cfg.rnn_name, cfg.rnn_input_size, cfg.rnn_size)
    p: Params = {
        "embedding": init(ks[0], (cfg.softmax_size, cfg.word_size)),
        "output_projection": dense_init(
            ks[1], cfg.rnn_size, cfg.softmax_size, use_bias=True, init=init),
        "cell": cell.init(ks[2], init),
        "attention": attention_init(ks[3], cfg.attention, init),
    }
    if cfg.init_method == "project_hidden":
        # linear im_embed -> h, no bias (model_base.py:657-672)
        p["rnn_initial_state"] = dense_init(
            ks[4], cfg.image_embed_size, cfg.rnn_size, use_bias=False, init=init)
    elif cfg.init_method == "first_input":
        # project im_embed to the cell input size, run the cell once
        # (model_base.py:673-685)
        p["rnn_init_input"] = dense_init(
            ks[5], cfg.image_embed_size, cfg.rnn_input_size,
            use_bias=False, init=init)
    else:
        raise ValueError(f"Invalid rnn_init_method: {cfg.init_method}")
    return p


def make_cell(cfg: DecoderConfig) -> Cell:
    return Cell(cfg.rnn_name, cfg.rnn_input_size, cfg.rnn_size)


def embed_ids(p: Params, cfg: DecoderConfig, ids: jnp.ndarray,
              dtype=None) -> jnp.ndarray:
    """ids -> word vectors.

    Radix/char vocabularies are tiny (258 / ~40 rows) so a one-hot matmul
    keeps the lookup on the MXU (model_base.py:574-594); word vocabs use a
    gather. Negative ids (<PAD>) embed as zeros via one-hot, or are clipped
    for the gather path (model_base.py:514-528).
    """
    table = p["embedding"]
    if cfg.token_type == "word":
        return jnp.take(table, jnp.maximum(ids, 0), axis=0)
    onehot = jax.nn.one_hot(ids, cfg.softmax_size, dtype=table.dtype)
    if dtype is not None:
        onehot, table = onehot.astype(dtype), table.astype(dtype)
    return jnp.matmul(onehot, table, preferred_element_type=jnp.float32)


def initial_state(p: Params, cfg: DecoderConfig, im_embed: jnp.ndarray,
                  dtype=None) -> DecoderState:
    """Build the decoder's initial state from the pooled image embedding."""
    cell = make_cell(cfg)
    batch = im_embed.shape[0]
    if cfg.init_method == "project_hidden":
        h = dense_apply(p["rnn_initial_state"], im_embed, dtype=dtype)
        cell_state = cell.state_from_hidden(h)
    else:  # first_input
        x0 = dense_apply(p["rnn_init_input"], im_embed, dtype=dtype)
        _, cell_state = cell.step(p["cell"], x0, cell.zero_state(batch),
                                  dtype=dtype)
    attn0 = jnp.zeros((batch, cfg.attention.context_size), jnp.float32)
    return DecoderState(cell_state=cell_state, attention=attn0)


class StepRNGs(NamedTuple):
    """Per-step dropout keys; None entries disable the corresponding dropout."""

    dropout_in: Optional[jax.Array] = None
    dropout_out: Optional[jax.Array] = None
    alignments: Optional[jax.Array] = None


def step(p: Params, cfg: DecoderConfig, word_vec: jnp.ndarray,
         state: DecoderState, memory: AttentionMemory, *,
         rngs: StepRNGs = StepRNGs(), training: bool = False,
         dtype=None,
         recurrent_noise: Optional[jnp.ndarray] = None,
         recurrent_out_noise: Optional[jnp.ndarray] = None,
         ) -> Tuple[jnp.ndarray, jnp.ndarray, DecoderState]:
    """One decode step (the innermost hot path, SURVEY.md §3.4).

    cell_in = [word_vec ; prev_context] -> cell -> h
    context, alignments = attend(h, memory)
    logits = W_out h + b

    Returns (logits (B, softmax), alignments (B, H, L), new_state).
    """
    x = jnp.concatenate([word_vec, state.attention], axis=-1)
    if training:
        x = apply_dropout(rngs.dropout_in, x, 1.0 - cfg.dropout_in,
                          deterministic=False, noise=recurrent_noise)
    cell = make_cell(cfg)
    h, cell_state = cell.step(p["cell"], x, state.cell_state, dtype=dtype)
    if training:
        h_dropped = apply_dropout(rngs.dropout_out, h, 1.0 - cfg.dropout_out,
                                  deterministic=False,
                                  noise=recurrent_out_noise)
    else:
        h_dropped = h
    context, alignments = attend(
        p["attention"], cfg.attention, h_dropped, memory, dtype=dtype,
        alignments_dropout_key=rngs.alignments if training else None,
        alignments_keep_prob=cfg.attn_keep_prob)
    logits = dense_apply(p["output_projection"], h_dropped, dtype=dtype)
    return logits, alignments, DecoderState(cell_state, context)


def step_grouped(p: Params, cfg: DecoderConfig, word_vec: jnp.ndarray,
                 state: DecoderState, memory: AttentionMemory, k: int, *,
                 dtype=None,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, DecoderState]:
    """Beam-grouped decode step: rows are (B*K) hypotheses, memory is the
    UNtiled per-image attention memory.

    The cell/projection (no per-image data) run on flat rows; attention runs
    grouped so keys/values are read once per image instead of once per beam
    (models/attention.attend_grouped). Inference-only: no dropout.
    """
    from .attention import attend_grouped

    x = jnp.concatenate([word_vec, state.attention], axis=-1)
    cell = make_cell(cfg)
    h, cell_state = cell.step(p["cell"], x, state.cell_state, dtype=dtype)
    b = memory.keys.shape[0]
    context, alignments = attend_grouped(
        p["attention"], cfg.attention, h.reshape(b, k, -1), memory,
        dtype=dtype)
    logits = dense_apply(p["output_projection"], h, dtype=dtype)
    context = context.reshape(b * k, -1)
    return logits, alignments, DecoderState(cell_state, context)


def teacher_forced(p: Params, cfg: DecoderConfig, inputs: jnp.ndarray,
                   im_embed: jnp.ndarray, feature_map: jnp.ndarray, *,
                   rng: Optional[jax.Array] = None, training: bool = False,
                   dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced decode over a full (B, T) id batch via one `lax.scan`.

    Replaces contrib dynamic_decode + TrainingHelper (ops_rnn.py:183-243).
    Returns (logits (B, T, softmax), alignments (B, T, H, L)).
    """
    memory = precompute(p["attention"], cfg.attention, feature_map, dtype=dtype)
    state0 = initial_state(p, cfg, im_embed, dtype=dtype)
    # Embed the whole input sequence in one batched matmul/gather.
    word_vecs = embed_ids(p, cfg, inputs, dtype=dtype)  # (B, T, word)
    word_vecs_t = jnp.swapaxes(word_vecs, 0, 1)  # scan over time

    t_steps = inputs.shape[1]
    use_dropout = training and rng is not None
    recurrent_noise = None
    recurrent_out_noise = None
    if use_dropout:
        if cfg.recurrent_dropout:
            # variational recurrent dropout: ONE mask per sequence reused
            # at every time step, for the INPUT and the OUTPUT dropout
            # alike — tf DropoutWrapper(variational_recurrent=True)
            # samples _recurrent_input_noise AND _recurrent_output_noise
            # once (model_base.py:636-648)
            rng, k_in, k_out = jax.random.split(rng, 3)
            if cfg.dropout_in > 0:
                keep = 1.0 - cfg.dropout_in
                mask = jax.random.bernoulli(
                    k_in, keep, (inputs.shape[0], cfg.rnn_input_size))
                recurrent_noise = jnp.where(mask, 1.0 / keep, 0.0)
            if cfg.dropout_out > 0:
                keep = 1.0 - cfg.dropout_out
                mask = jax.random.bernoulli(
                    k_out, keep, (inputs.shape[0], cfg.rnn_size))
                recurrent_out_noise = jnp.where(mask, 1.0 / keep, 0.0)
        xs = (word_vecs_t, jax.random.split(rng, t_steps))
    else:
        xs = (word_vecs_t, jnp.zeros((t_steps,), jnp.int32))

    def body_fn(p, recurrent_noise, recurrent_out_noise, state, xs):
        wv, key = xs
        if use_dropout:
            k1, k2, k3 = jax.random.split(key, 3)
            rngs = StepRNGs(k1, k2, k3)
        else:
            rngs = StepRNGs()
        logits, align, new_state = step(
            p, cfg, wv, state, memory, rngs=rngs, training=use_dropout,
            dtype=dtype, recurrent_noise=recurrent_noise,
            recurrent_out_noise=recurrent_out_noise)
        return new_state, (logits, align)

    if training:
        # Rematerialize the step in the backward pass, keeping only matmul
        # outputs: storing every step's (rows, L, U) attention intermediates
        # as scan residuals makes the backward HBM-bound. Measured at the
        # SCST operating point (70 rows, T=42): fwd+bwd 39.0 -> 20.0 ms.
        # Dropout keys are scan inputs, so the replay is bit-identical.
        # REMAT_POLICY is a module knob so the policy sweep in
        # tools/remat_sweep.py can measure alternatives; the default was
        # re-confirmed optimal in r3 (see CLAUDE.md perf notes).
        body_fn = jax.checkpoint(body_fn, policy=REMAT_POLICY)

    def body(state, xs):
        return body_fn(p, recurrent_noise, recurrent_out_noise, state, xs)

    _, (logits_t, align_t) = jax.lax.scan(body, state0, xs)
    logits = jnp.swapaxes(logits_t, 0, 1)  # (B, T, S)
    alignments = jnp.swapaxes(align_t, 0, 1)  # (B, T, H, L)
    return logits, alignments
