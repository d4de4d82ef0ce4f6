"""On-device caption decoding: greedy, multinomial sampling, beam search.

Replaces the reference's contrib seq2seq decode stack
(/root/reference/common/ops_rnn.py:49-243 rnn_decoder_search /
rnn_decoder_beam_search + BeamSearchDecoderMultiHead :807-846) with fully
on-device fixed-length `lax.scan` loops over static-shape hypothesis state:

  - batch x beam is folded into one leading axis so every step is one big
    batched matmul chain on the MXU — no per-hypothesis control flow;
  - attention keys/values are precomputed once per image and broadcast
    across beams (the reference re-tiles the raw feature map instead);
  - when attention maps are recorded, sequence history comes out of a
    fixed-length scan as STACKED per-step outputs (token, parent,
    alignment) — a carried ALIGNMENT history buffer updated with
    `.at[t].set` inside `lax.while_loop` costs a padded-layout copy of
    the whole buffer every iteration on TPU (measured ~0.8 ms/step);
  - serving (no attention maps) instead uses an early-exit
    `lax.while_loop` over only the SMALL ids/parent buffers — +0.9%
    worst-case cost, stops when every beam has emitted EOS (the contrib
    dynamic_decode condition), output-identical to the full scan;
  - beam hypotheses are reconstructed afterwards with one parent-pointer
    backtrack (the `gather_tree` idea as a reverse scan); only the small
    decoder state is reordered inside the loop.

Semantics matched to contrib BeamSearchDecoder: log-prob accumulation,
finished beams locked to emit EOS with zero added log-prob, Google-NMT
length penalty ((5 + len) / 6) ** alpha applied to selection scores and
final ordering, beams sorted best-first.
"""

from __future__ import annotations

import sys
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
    step_grouped,
)
from ..models.encoders import encode_images

NEG_INF = jnp.float32(-1e9)

# Serving batch fence (measured on TPU v5e, tools/batch_sweep.py, r4).
# The attention keys+values are loop-invariant across the decode scan;
# up to ~51.4 MB (COMIC-256 shapes: batch 128 x L 196 x U 512, bf16,
# keys+values) XLA keeps them VMEM-resident and the decode attention
# step costs ~0.60 us/beam-row. One step past it (batch 136 = 54.6 MB)
# they are re-streamed from HBM every decode step: +69 us/step measured
# == 55 MB / 819 GB/s, i.e. ~0.80 us/row at EVERY batch >= 136 (b256
# included). Between those two measured points we fence at 52 MB.
# A user picking batch 144 over 128 silently loses ~30% throughput —
# warn loudly at trace time (once per compiled shape).
_VMEM_RESIDENT_BYTES = 52_000_000


def _warn_if_memory_spills(memory: AttentionMemory, where: str,
                           dp_shards: int = 1) -> None:
    """Print a loud trace-time warning when the decode's attention memory
    exceeds the measured VMEM-residency boundary (see above).

    ``dp_shards``: number of devices the batch axis is data-parallel
    sharded over. Traced shapes under jit are GLOBAL, so the per-DEVICE
    footprint — the quantity the VMEM boundary applies to — is
    nbytes/dp_shards (e.g. global batch 1024 over 8 chips = 128/chip is
    the fast regime and must not warn)."""
    nbytes = (memory.keys.size * memory.keys.dtype.itemsize
              + memory.values.size * memory.values.dtype.itemsize)
    per_device = nbytes / max(int(dp_shards), 1)
    if per_device <= _VMEM_RESIDENT_BYTES:
        return
    batch, mem_len = memory.keys.shape[0], memory.keys.shape[1]
    per_image = nbytes / batch
    fast_batch = int(_VMEM_RESIDENT_BYTES // per_image) * max(
        int(dp_shards), 1)
    shard_note = (f" ({dp_shards}-way data-parallel: "
                  f"{per_device / 1e6:.1f} MB/device)" if dp_shards > 1
                  else "")
    # stderr: bench.py / tools/*_sweep.py promise machine-readable stdout
    print(f"WARNING: {where}: attention keys+values are "
          f"{nbytes / 1e6:.1f} MB at batch {batch}{shard_note} — past the "
          f"~52 MB/device VMEM-residency boundary, every decode step "
          f"re-streams them from HBM (~+35% step cost measured; "
          f"tools/batch_sweep.py). For these shapes (L={mem_len}) batch "
          f"<= {fast_batch} is the fast regime; prefer more, smaller "
          f"batches.", file=sys.stderr)


class DecodeOutput(NamedTuple):
    ids: jnp.ndarray  # (B, T) generated token ids (PAD/EOS after finish)
    scores: jnp.ndarray  # (B,) sum log prob (greedy/sample) or beam score
    alignments: jnp.ndarray  # (B, H, T, L) attention maps, reference layout
    lengths: jnp.ndarray  # (B,) decode steps INCLUDING the EOS-emitting
    # one (contrib semantics; beam length-penalty re-scoring relies on it)


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

def greedy_or_sample(
    params: Params, spec: ModelSpec, images: jnp.ndarray, *,
    max_steps: int, sample: bool = False,
    rng: Optional[jax.Array] = None, collect_alignments: bool = True,
    early_exit: bool = False, dp_shards: int = 1,
) -> DecodeOutput:
    """Greedy argmax decode, or multinomial sampling when `sample`."""
    im_embed, memory = _prepare_memory(params, spec, images)
    return greedy_or_sample_from_memory(
        params["decoder"], spec, im_embed, memory,
        max_steps=max_steps, sample=sample, rng=rng,
        collect_alignments=collect_alignments, early_exit=early_exit,
        dp_shards=dp_shards)


def greedy_or_sample_from_memory(
    dec_params: Params, spec: ModelSpec, im_embed: jnp.ndarray,
    memory: AttentionMemory, *, max_steps: int, sample: bool = False,
    rng: Optional[jax.Array] = None, collect_alignments: bool = True,
    early_exit: bool = False, dp_shards: int = 1,
) -> DecodeOutput:
    """Core search over precomputed encoder outputs.

    Exposed separately so SCST can encode each image batch ONCE and share
    the attention memory between the sampling, greedy-baseline, and
    training passes (the reference re-runs the CNN for each,
    SURVEY.md §3.2).
    """
    dcfg = spec.decoder
    batch = im_embed.shape[0]
    heads = dcfg.attention.num_heads
    mem_len = memory.keys.shape[1]
    _warn_if_memory_spills(memory, "greedy/sample decode", dp_shards)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_keys = jax.random.split(rng, max_steps)

    state0 = initial_state(dec_params, dcfg, im_embed,
                           dtype=spec.compute_dtype)
    carry0 = (
        state0,
        jnp.full((batch,), dcfg.start_id, jnp.int32),  # prev token
        jnp.zeros((batch,), bool),  # finished
        jnp.zeros((batch,), jnp.float32),  # log prob
        jnp.zeros((batch,), jnp.int32),  # lengths
    )

    def body(carry, key):
        dec_state, prev, finished, log_prob, lengths = carry
        wv = embed_ids(dec_params, dcfg, prev, dtype=spec.compute_dtype)
        logits, align, dec_state = decoder_step(
            dec_params, dcfg, wv, dec_state, memory,
            dtype=spec.compute_dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if sample:
            nxt = jax.random.categorical(key, logp, axis=-1)
        else:
            nxt = jnp.argmax(logp, axis=-1)
        nxt = nxt.astype(jnp.int32)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        write = jnp.where(finished, -1, nxt)  # finished rows emit PAD
        log_prob = log_prob + jnp.where(finished, 0.0, tok_logp)
        lengths = lengths + jnp.where(finished, 0, 1)
        if collect_alignments:
            align_out = align.astype(jnp.float32) * (
                ~finished)[:, None, None]
        else:
            align_out = jnp.zeros((1, 1, 1), jnp.float32)
        new_finished = jnp.logical_or(finished, nxt == dcfg.end_id)
        return ((dec_state, nxt, new_finished, log_prob, lengths),
                (write, align_out))

    if early_exit and not collect_alignments:
        # while_loop that stops once every row has emitted EOS (the
        # reference GreedyEmbeddingHelper/dynamic_decode behavior,
        # ops_rnn.py:115-180). Finished rows write PAD, so the
        # pre-initialized tail equals what the full scan would write.
        ids_buf0 = jnp.full((max_steps, batch), -1, jnp.int32)

        def cond(state):
            carry, t, _ = state
            return jnp.logical_and(t < max_steps,
                                   jnp.logical_not(jnp.all(carry[2])))

        def wbody(state):
            carry, t, ids_buf = state
            carry, (write, _) = body(carry, step_keys[t])
            ids_buf = jax.lax.dynamic_update_index_in_dim(
                ids_buf, write, t, axis=0)
            return carry, t + 1, ids_buf

        (_, _, _, log_prob, lengths), _, ids_t = jax.lax.while_loop(
            cond, wbody, (carry0, jnp.int32(0), ids_buf0))
        align_t = None
    else:
        (_, _, _, log_prob, lengths), (ids_t, align_t) = jax.lax.scan(
            body, carry0, step_keys)

    if collect_alignments:
        alignments = jnp.transpose(align_t, (1, 2, 0, 3))  # (B, H, T, L)
    else:
        alignments = jnp.zeros((batch, heads, max_steps, mem_len),
                               jnp.float32)
    return DecodeOutput(
        ids=jnp.transpose(ids_t, (1, 0)),
        scores=log_prob,
        alignments=alignments,
        lengths=lengths,
    )


# --------------------------------------------------------------------------
# Beam search
# --------------------------------------------------------------------------

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
    collect_alignments: bool = True, early_exit: bool = False,
    dp_shards: int = 1,
) -> Tuple[DecodeOutput, Dict[str, jnp.ndarray]]:
    """Batched beam search, all hypothesis state on device.

    Returns (top-beam DecodeOutput, dict with all-beam ids/scores in the
    reference's (beam, batch, time) layout for SCST sampling,
    model_base.py:286-288).
    """
    im_embed, memory = _prepare_memory(params, spec, images)
    return beam_search_from_memory(
        params["decoder"], spec, im_embed, memory, beam_size=beam_size,
        max_steps=max_steps, length_penalty=length_penalty,
        collect_alignments=collect_alignments, early_exit=early_exit,
        dp_shards=dp_shards)


def beam_search_from_memory(
    dec_params: Params, spec: ModelSpec, im_embed: jnp.ndarray,
    memory: AttentionMemory, *, beam_size: int, max_steps: int,
    length_penalty: float = 0.0, collect_alignments: bool = True,
    early_exit: bool = False, dp_shards: int = 1,
) -> Tuple[DecodeOutput, Dict[str, jnp.ndarray]]:
    """Core beam search over precomputed encoder outputs.

    `early_exit=True` switches the fixed-length `lax.scan` for a
    `lax.while_loop` that stops once every beam has emitted EOS — the
    contrib dynamic_decode stop condition (ops_rnn.py:98-104). Outputs
    are identical to the full-length scan (finished beams are frozen, so
    the remaining steps are no-ops — equivalence-tested); on real data
    captions finish in ~1/2 of max_steps, so serving throughput roughly
    doubles. Requires collect_alignments=False (the serving default):
    the alignment history would make the carried buffer copy expensive
    (the measured 0.8 ms/step while_loop cost, CLAUDE.md)."""
    dcfg = spec.decoder
    k = beam_size
    batch = im_embed.shape[0]
    heads = dcfg.attention.num_heads
    mem_len = memory.keys.shape[1]
    vocab = dcfg.softmax_size
    _warn_if_memory_spills(memory, f"beam-{k} decode", dp_shards)

    # Beams share their image's attention memory — it stays UNtiled and is
    # read once per image per step (attend_grouped); only the tiny decoder
    # state is replicated across beams (row b*K + j is image b).
    def tile(x):
        return jnp.repeat(x, k, axis=0)

    dec_state0 = jax.tree_util.tree_map(
        tile, initial_state(dec_params, dcfg, im_embed,
                            dtype=spec.compute_dtype))

    # Beam 0 starts live; the rest start at -inf so step 1 picks distinct
    # continuations of the single start token.
    init_logp = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)])[None],
        (batch, 1)).astype(jnp.float32)

    carry0 = (
        dec_state0,
        jnp.full((batch, k), dcfg.start_id, jnp.int32),  # prev tokens
        init_logp,  # cumulative log probs
        jnp.zeros((batch, k), bool),  # finished
        jnp.zeros((batch, k), jnp.int32),  # lengths
    )

    eos_onehot = jax.nn.one_hot(dcfg.end_id, vocab, dtype=jnp.float32)
    locked = jnp.where(eos_onehot[None, None] > 0, 0.0, NEG_INF)

    def advance(core):
        dec_state, prev, log_probs, finished, lengths = core
        wv = embed_ids(dec_params, dcfg, prev.reshape(-1),
                       dtype=spec.compute_dtype)
        logits, align, dec_state = step_grouped(
            dec_params, dcfg, wv, dec_state, memory, k,
            dtype=spec.compute_dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(batch, k, vocab)

        # Finished beams: lock to EOS with zero added log-prob
        # (contrib _mask_probs semantics).
        logp = jnp.where(finished[:, :, None], locked, logp)

        total = log_probs[:, :, None] + logp  # (B, K, V)
        # contrib _beam_search_step candidate lengths: +1 for live beams
        # EXCEPT the EOS column (one_hot(end_token, on=0, off=1)) — the
        # step that emits EOS is not counted at selection time, though the
        # carried length below does count it (contrib quirk, reproduced)
        live = jnp.where(finished[:, :, None], 0, 1)
        not_eos = (1.0 - eos_onehot).astype(lengths.dtype)  # 0 at end_id
        new_lengths = lengths[:, :, None] + live * not_eos[None, None, :]
        scores = total / _length_penalty(new_lengths, length_penalty)

        flat_scores = scores.reshape(batch, k * vocab)
        sel_scores, top_idx = jax.lax.top_k(flat_scores, k)  # (B, K)
        parent = (top_idx // vocab).astype(jnp.int32)  # (B, K)
        token = (top_idx % vocab).astype(jnp.int32)

        new_logp = jnp.take_along_axis(
            total.reshape(batch, k * vocab), top_idx, axis=1)
        was_finished = jnp.take_along_axis(finished, parent, axis=1)
        new_lens = (jnp.take_along_axis(lengths, parent, axis=1)
                    + jnp.where(was_finished, 0, 1))
        new_finished = jnp.logical_or(was_finished, token == dcfg.end_id)

        # Only the (small) decoder state is reordered in the loop; sequence
        # history is recovered by backtracking (token, parent) afterwards.
        dec_state = _gather_beams(dec_state, parent, batch, k)
        token_out = jnp.where(was_finished, dcfg.end_id, token)
        return ((dec_state, token, new_logp, new_finished, new_lens),
                token_out, parent, align, sel_scores)

    if early_exit and not collect_alignments:
        # while_loop with pre-initialized history buffers. Unwritten tail
        # steps hold (token=EOS, parent=identity), which the backtrack
        # walks through as no-ops — exactly what the full scan's frozen
        # steps produce.
        token_buf0 = jnp.full((max_steps, batch, k), dcfg.end_id, jnp.int32)
        parent_buf0 = jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32), (max_steps, batch, k))

        def cond(state):
            core, t, _, _, _ = state
            return jnp.logical_and(t < max_steps,
                                   jnp.logical_not(jnp.all(core[3])))

        def wbody(state):
            core, t, token_buf, parent_buf, _ = state
            core, token_out, parent, _, sel_scores = advance(core)
            token_buf = jax.lax.dynamic_update_index_in_dim(
                token_buf, token_out, t, axis=0)
            parent_buf = jax.lax.dynamic_update_index_in_dim(
                parent_buf, parent, t, axis=0)
            return core, t + 1, token_buf, parent_buf, sel_scores

        core, t_final, token_buf, parent_buf, last_sel = jax.lax.while_loop(
            cond, wbody,
            ((carry0), jnp.int32(0), token_buf0, parent_buf0,
             jnp.zeros((batch, k), jnp.float32)))
        _, _, log_probs, finished, lengths = core
        # When the loop exits early (all beams finished), the full scan
        # would have kept re-scoring the frozen beams as locked EOS
        # candidates — log-prob unchanged, penalty on the CARRIED
        # (EOS-counted) length — through its last step. Reproduce that
        # final re-scoring so both variants emit identical scores; on a
        # max_steps exit the last step's selection scores are already
        # exactly what the scan's sel_buf[-1] holds.
        locked_final = log_probs / _length_penalty(lengths, length_penalty)
        final_scores = jnp.where(t_final < max_steps, locked_final,
                                 last_sel)
    else:
        def body(carry, _):
            core, token_out, parent, align, sel_scores = advance(carry)
            if collect_alignments:
                align_out = align.astype(jnp.float32)  # (B, K, H, L)
            else:
                align_out = jnp.zeros((1, 1, 1, 1), jnp.float32)
            return core, (token_out, parent, align_out, sel_scores)

        ((_, _, log_probs, finished, lengths),
         (token_buf, parent_buf, align_buf, sel_buf)) = jax.lax.scan(
            body, carry0, None, length=max_steps)
        # Final beam order = the LAST step's top-k selection order
        # (contrib's finalize performs no extra sort; each step's top_k
        # already emits beams best-first by the EOS-aware
        # length-penalized score).
        final_scores = sel_buf[-1]
    order = jnp.argsort(-final_scores, axis=1)  # (B, K); identity-stable
    scores_sorted = jnp.take_along_axis(final_scores, order, axis=1)
    lengths_sorted = jnp.take_along_axis(lengths, order, axis=1)

    # Parent-pointer backtrack (reverse scan): recover all K sequences in
    # sorted order plus the beam-index path for the alignment gather.
    def back(beam_idx, xs):
        tok_t, par_t = xs  # (B, K) each
        tok = jnp.take_along_axis(tok_t, beam_idx, axis=1)
        par = jnp.take_along_axis(par_t, beam_idx, axis=1)
        return par, (tok, par)

    _, (toks_rev, pars_rev) = jax.lax.scan(
        back, order, (token_buf[::-1], parent_buf[::-1]))
    ids_sorted = jnp.transpose(toks_rev[::-1], (1, 2, 0))  # (B, K, T)

    if collect_alignments:
        # alignment of step t on the top path was computed for beam
        # j_{t-1} = parent of the step-t choice
        path_prev = pars_rev[::-1][:, :, 0]  # (T, B)
        align_top = jnp.take_along_axis(
            align_buf,
            path_prev[:, :, None, None, None], axis=2)[:, :, 0]  # (T,B,H,L)
        alignments = jnp.transpose(align_top, (1, 2, 0, 3))  # (B, H, T, L)
    else:
        alignments = jnp.zeros(
            (batch, heads, max_steps, mem_len), jnp.float32)

    top = DecodeOutput(
        ids=ids_sorted[:, 0],
        scores=scores_sorted[:, 0],
        alignments=alignments,
        lengths=lengths_sorted[:, 0],
    )
    all_beams = {
        # (beam, batch, time) — reference all-beam layout (model_base.py:286-288)
        "ids": jnp.transpose(ids_sorted, (1, 0, 2)),
        "scores": jnp.transpose(scores_sorted, (1, 0)),
    }
    return top, all_beams
