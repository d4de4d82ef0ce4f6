"""On-device caption decoding: greedy, multinomial sampling, beam search.

Replaces the reference's contrib seq2seq decode stack
(/root/reference/common/ops_rnn.py:49-243 rnn_decoder_search /
rnn_decoder_beam_search + BeamSearchDecoderMultiHead :807-846) with fully
on-device `lax.while_loop`s over static-shape hypothesis state:

  - batch x beam is folded into one leading axis so every step is one big
    batched matmul chain on the MXU — no per-hypothesis control flow;
  - attention keys/values are precomputed once per image and broadcast
    across beams (the reference re-tiles the raw feature map instead);
  - beam reordering is a gather on the carried state each step, which makes
    the final `gather_tree` backtracking unnecessary;
  - loops exit early once every sequence has emitted EOS.

Semantics matched to contrib BeamSearchDecoder: log-prob accumulation,
finished beams locked to emit EOS with zero added log-prob, Google-NMT
length penalty ((5 + len) / 6) ** alpha applied to selection scores and
final ordering, beams sorted best-first.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.attention import AttentionMemory, precompute
from ..models.captioner import ModelSpec, Params
from ..models.decoder import (
    DecoderState,
    embed_ids,
    initial_state,
    step as decoder_step,
)
from ..models.encoders import encode_images

NEG_INF = jnp.float32(-1e9)


class DecodeOutput(NamedTuple):
    ids: jnp.ndarray  # (B, T) generated token ids (EOS and after -> end_id / PAD)
    scores: jnp.ndarray  # (B,) sum log prob (greedy/sample) or beam score
    alignments: jnp.ndarray  # (B, H, T, L) attention maps, reference layout
    lengths: jnp.ndarray  # (B,) steps before EOS


def _prepare_memory(params: Params, spec: ModelSpec, images: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, AttentionMemory]:
    im_embed, fmaps = encode_images(
        params["encoder"], images, spec.cnn_name, spec.fm_endpoint,
        legacy=spec.legacy, dtype=spec.compute_dtype)
    memory = precompute(params["decoder"]["attention"], spec.decoder.attention,
                        fmaps, dtype=spec.compute_dtype)
    return im_embed, memory


# --------------------------------------------------------------------------
# Greedy / sampling search (ops_rnn.py:115-180 semantics)
# --------------------------------------------------------------------------

class _SearchState(NamedTuple):
    t: jnp.ndarray
    dec_state: DecoderState
    prev_id: jnp.ndarray  # (B,)
    finished: jnp.ndarray  # (B,) bool
    log_prob: jnp.ndarray  # (B,)
    lengths: jnp.ndarray  # (B,)
    ids_buf: jnp.ndarray  # (B, T)
    align_buf: jnp.ndarray  # (B, T, H, L)
    rng: jax.Array


def greedy_or_sample(
    params: Params, spec: ModelSpec, images: jnp.ndarray, *,
    max_steps: int, sample: bool = False,
    rng: Optional[jax.Array] = None,
) -> DecodeOutput:
    """Greedy argmax decode, or multinomial sampling when `sample`."""
    im_embed, memory = _prepare_memory(params, spec, images)
    return greedy_or_sample_from_memory(
        params["decoder"], spec, im_embed, memory,
        max_steps=max_steps, sample=sample, rng=rng)


def greedy_or_sample_from_memory(
    dec_params: Params, spec: ModelSpec, im_embed: jnp.ndarray,
    memory: AttentionMemory, *, max_steps: int, sample: bool = False,
    rng: Optional[jax.Array] = None,
) -> DecodeOutput:
    """Core search over precomputed encoder outputs.

    Exposed separately so SCST can encode each image batch ONCE and share
    the attention memory between the sampling, greedy-baseline, and
    training passes (the reference re-runs the CNN for each,
    SURVEY.md §3.2).
    """
    params = {"decoder": dec_params}
    dcfg = spec.decoder
    batch = im_embed.shape[0]
    heads = dcfg.attention.num_heads
    mem_len = memory.keys.shape[1]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    state0 = _SearchState(
        t=jnp.int32(0),
        dec_state=initial_state(params["decoder"], dcfg, im_embed,
                                dtype=spec.compute_dtype),
        prev_id=jnp.full((batch,), dcfg.start_id, jnp.int32),
        finished=jnp.zeros((batch,), bool),
        log_prob=jnp.zeros((batch,), jnp.float32),
        lengths=jnp.zeros((batch,), jnp.int32),
        ids_buf=jnp.full((batch, max_steps), -1, jnp.int32),
        align_buf=jnp.zeros((batch, max_steps, heads, mem_len), jnp.float32),
        rng=rng,
    )

    def cond(s: _SearchState):
        return jnp.logical_and(s.t < max_steps, ~jnp.all(s.finished))

    def body(s: _SearchState):
        wv = embed_ids(params["decoder"], dcfg, s.prev_id,
                       dtype=spec.compute_dtype)
        logits, align, dec_state = decoder_step(
            params["decoder"], dcfg, wv, s.dec_state, memory,
            dtype=spec.compute_dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if sample:
            rng, sub = jax.random.split(s.rng)
            nxt = jax.random.categorical(sub, logp, axis=-1)
        else:
            rng = s.rng
            nxt = jnp.argmax(logp, axis=-1)
        nxt = nxt.astype(jnp.int32)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        # finished rows emit PAD and stop accumulating
        write = jnp.where(s.finished, -1, nxt)
        log_prob = s.log_prob + jnp.where(s.finished, 0.0, tok_logp)
        lengths = s.lengths + jnp.where(s.finished, 0, 1)
        finished = jnp.logical_or(s.finished, nxt == dcfg.end_id)
        ids_buf = s.ids_buf.at[:, s.t].set(write)
        align_buf = s.align_buf.at[:, s.t].set(
            align.astype(jnp.float32) * (~s.finished)[:, None, None])
        return _SearchState(s.t + 1, dec_state, nxt, finished, log_prob,
                            lengths, ids_buf, align_buf, rng)

    final = jax.lax.while_loop(cond, body, state0)
    return DecodeOutput(
        ids=final.ids_buf,
        scores=final.log_prob,
        alignments=jnp.transpose(final.align_buf, (0, 2, 1, 3)),
        lengths=final.lengths,
    )


# --------------------------------------------------------------------------
# Beam search
# --------------------------------------------------------------------------

class _BeamState(NamedTuple):
    t: jnp.ndarray
    dec_state: DecoderState  # leaves (B*K, ...)
    prev_id: jnp.ndarray  # (B, K)
    log_probs: jnp.ndarray  # (B, K) cumulative log prob
    finished: jnp.ndarray  # (B, K) bool
    lengths: jnp.ndarray  # (B, K)
    ids_buf: jnp.ndarray  # (B, K, T)
    align_buf: jnp.ndarray  # (B, K, T, H, L)


def _length_penalty(lengths: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Google-NMT penalty ((5 + len) / 6) ** alpha, the contrib formula."""
    if alpha == 0.0:
        return jnp.ones_like(lengths, jnp.float32)
    return jnp.power((5.0 + lengths.astype(jnp.float32)) / 6.0, alpha)


def _gather_beams(tree, parent: jnp.ndarray, batch: int, k: int):
    """Reorder (B*K, ...) leaves by per-batch parent beam indices (B, K)."""

    def g(x):
        xs = x.reshape(batch, k, *x.shape[1:])
        return jnp.take_along_axis(
            xs, parent.reshape(batch, k, *([1] * (x.ndim - 1))), axis=1
        ).reshape(batch * k, *x.shape[1:])

    return jax.tree_util.tree_map(g, tree)


def beam_search(
    params: Params, spec: ModelSpec, images: jnp.ndarray, *,
    beam_size: int, max_steps: int, length_penalty: float = 0.0,
) -> Tuple[DecodeOutput, Dict[str, jnp.ndarray]]:
    """Batched beam search, all hypothesis state on device.

    Returns (top-beam DecodeOutput, dict with all-beam ids/scores in the
    reference's (beam, batch, time) layout for SCST sampling,
    model_base.py:286-288).
    """
    im_embed, memory = _prepare_memory(params, spec, images)
    return beam_search_from_memory(
        params["decoder"], spec, im_embed, memory, beam_size=beam_size,
        max_steps=max_steps, length_penalty=length_penalty)


def beam_search_from_memory(
    dec_params: Params, spec: ModelSpec, im_embed: jnp.ndarray,
    memory: AttentionMemory, *, beam_size: int, max_steps: int,
    length_penalty: float = 0.0,
) -> Tuple[DecodeOutput, Dict[str, jnp.ndarray]]:
    """Core beam search over precomputed encoder outputs."""
    params = {"decoder": dec_params}
    dcfg = spec.decoder
    k = beam_size
    batch = im_embed.shape[0]
    heads = dcfg.attention.num_heads
    mem_len = memory.keys.shape[1]

    # Broadcast per-image tensors across beams: row b*K + j is image b.
    def tile(x):
        return jnp.repeat(x, k, axis=0)

    memory_k = AttentionMemory(keys=tile(memory.keys),
                               values=tile(memory.values))
    dec_state0 = jax.tree_util.tree_map(
        tile, initial_state(params["decoder"], dcfg, im_embed,
                            dtype=spec.compute_dtype))

    # Beam 0 starts live; the rest start at -inf so step 1 picks distinct
    # continuations of the single start token.
    init_logp = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)])[None],
        (batch, 1)).astype(jnp.float32)

    state0 = _BeamState(
        t=jnp.int32(0),
        dec_state=dec_state0,
        prev_id=jnp.full((batch, k), dcfg.start_id, jnp.int32),
        log_probs=init_logp,
        finished=jnp.zeros((batch, k), bool),
        lengths=jnp.zeros((batch, k), jnp.int32),
        ids_buf=jnp.full((batch, k, max_steps), dcfg.end_id, jnp.int32),
        align_buf=jnp.zeros((batch, k, max_steps, heads, mem_len),
                            jnp.float32),
    )
    vocab = dcfg.softmax_size

    def cond(s: _BeamState):
        return jnp.logical_and(s.t < max_steps, ~jnp.all(s.finished))

    def body(s: _BeamState):
        wv = embed_ids(params["decoder"], dcfg, s.prev_id.reshape(-1),
                       dtype=spec.compute_dtype)
        logits, align, dec_state = decoder_step(
            params["decoder"], dcfg, wv, s.dec_state, memory_k,
            dtype=spec.compute_dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(batch, k, vocab)

        # Finished beams: lock to EOS with zero added log-prob
        # (contrib _mask_probs semantics).
        eos_onehot = jax.nn.one_hot(dcfg.end_id, vocab, dtype=jnp.float32)
        locked = jnp.where(eos_onehot[None, None] > 0, 0.0, NEG_INF)
        logp = jnp.where(s.finished[:, :, None], locked, logp)

        total = s.log_probs[:, :, None] + logp  # (B, K, V)
        new_lengths = s.lengths[:, :, None] + jnp.where(
            s.finished[:, :, None], 0, 1)
        scores = total / _length_penalty(new_lengths, length_penalty)

        flat_scores = scores.reshape(batch, k * vocab)
        _, top_idx = jax.lax.top_k(flat_scores, k)  # (B, K)
        parent = top_idx // vocab  # (B, K)
        token = (top_idx % vocab).astype(jnp.int32)

        new_logp = jnp.take_along_axis(
            total.reshape(batch, k * vocab), top_idx, axis=1)
        was_finished = jnp.take_along_axis(s.finished, parent, axis=1)
        lengths = (jnp.take_along_axis(s.lengths, parent, axis=1)
                   + jnp.where(was_finished, 0, 1))
        finished = jnp.logical_or(was_finished, token == dcfg.end_id)

        # Reorder carried state by parent beam.
        dec_state = _gather_beams(dec_state, parent, batch, k)
        ids_buf = jnp.take_along_axis(s.ids_buf, parent[:, :, None], axis=1)
        ids_buf = ids_buf.at[:, :, s.t].set(
            jnp.where(was_finished, dcfg.end_id, token))
        align_buf = jnp.take_along_axis(
            s.align_buf, parent[:, :, None, None, None], axis=1)
        align_k = align.astype(jnp.float32).reshape(batch, k, heads, mem_len)
        align_k = jnp.take_along_axis(
            align_k, parent[:, :, None, None], axis=1)
        align_buf = align_buf.at[:, :, s.t].set(
            align_k * (~was_finished)[:, :, None, None])

        return _BeamState(s.t + 1, dec_state, token, new_logp, finished,
                          lengths, ids_buf, align_buf)

    final = jax.lax.while_loop(cond, body, state0)

    # Sort beams best-first by length-penalized score.
    final_scores = final.log_probs / _length_penalty(
        final.lengths, length_penalty)
    order = jnp.argsort(-final_scores, axis=1)  # (B, K)
    ids_sorted = jnp.take_along_axis(final.ids_buf, order[:, :, None], axis=1)
    scores_sorted = jnp.take_along_axis(final_scores, order, axis=1)
    lengths_sorted = jnp.take_along_axis(final.lengths, order, axis=1)
    align_sorted = jnp.take_along_axis(
        final.align_buf, order[:, :, None, None, None], axis=1)

    top = DecodeOutput(
        ids=ids_sorted[:, 0],
        scores=scores_sorted[:, 0],
        alignments=jnp.transpose(align_sorted[:, 0], (0, 2, 1, 3)),
        lengths=lengths_sorted[:, 0],
    )
    all_beams = {
        # (beam, batch, time) — reference all-beam layout (model_base.py:286-288)
        "ids": jnp.transpose(ids_sorted, (1, 0, 2)),
        "scores": jnp.transpose(scores_sorted, (1, 0)),
    }
    return top, all_beams
