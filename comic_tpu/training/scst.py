"""SCST (self-critical sequence training) REINFORCE fine-tuning.

TPU-native re-design of the reference SCST loop
(/root/reference/src/train_fn.py:150-307, SURVEY.md §3.2). The reference
crosses the host boundary three times per step and re-runs the CNN for the
sample pass, the greedy pass, AND the beam-tiled training pass. Here:

  1. ONE jitted `rollout` encodes the images once and runs both the beam-7
     sampling decode and the greedy baseline decode off the shared attention
     memory; it returns the decoded ids plus the encoder outputs, which stay
     resident on device.
  2. The host converts ids -> caption strings, scores CIDEr-D/BLEU rewards
     (reward = score(sample) - score(greedy), train_fn.py:243-248), and
     re-encodes the hypotheses to padded ids (fixed width -> one compiled
     train graph).
  3. ONE jitted `train_step` teacher-forces the hypotheses against the
     beam-repeated encoder outputs (repeated on device in image-major row
     order, never re-encoded) with per-example XE x reward
     (model_base.py:342-347) + map/L2 losses.

  Rollout for batch t+1 is dispatched before the host scores batch t, so
  CIDEr computation overlaps device compute.

  DIVERGENCE from the reference (documented per CLAUDE.md): with the
  default overlap (`scst_overlap=True`), batch t's hypotheses are sampled
  from parameters that are ONE update older than the parameters the
  gradient is applied to (the reference samples, scores, and trains with
  the same params). This is the standard one-step-stale async-RL trade;
  at SCST's tiny learning rates the bias is negligible and the overlap
  hides the entire host CIDEr cost. Set `scst_overlap=False` for the
  reference's strict on-policy schedule (rollout -> score -> train on the
  same batch, no overlap).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration import Config
from ..data.pipeline import ScstPipeline
from ..data.preprocessing import preprocess_for
from ..decoding.search import beam_search_from_memory, greedy_or_sample_from_memory
from ..models.attention import AttentionMemory, precompute
from ..models.captioner import (
    ModelSpec,
    attention_map_loss,
    build_model_spec,
    init_params,
    process_captions,
    sequence_loss,
)
from ..models.decoder import teacher_forced
from ..models.encoders import encode_images
from ..evaluation.scorers import CaptionScorer
from ..tokenization import (
    RadixCodec,
    Vocabulary,
    caption_strings_to_batched_ids,
    ids_to_captions,
)
from ..utils.summaries import SummaryWriter
from . import checkpoints as ckpt
from .optimizer import build_optimizer, masked_l2_loss
from .schedule import cosine_schedule
from .xe import TrainState, _resolve_vocab

SCST_MAX_WORDS = 20  # forced during SCST sampling (model_base.py:203-206)


def scst_decode_steps(config: Config, vocab: Vocabulary) -> int:
    steps = SCST_MAX_WORDS
    if config.token_type == "radix":
        steps *= RadixCodec(len(vocab), config.radix_base).word_len
    elif config.token_type == "char":
        steps *= 5
    return steps


def hypo_width(config: Config, vocab: Vocabulary) -> int:
    """Static padded width for hypothesis id batches: GO + body + EOS."""
    return scst_decode_steps(config, vocab) + 2


def make_rollout(spec: ModelSpec, config: Config, vocab: Vocabulary,
                 mesh=None):
    """(params, images_u8, key) -> (greedy_ids, beam_ids, im_embed, fmaps).

    beam_ids come back in the reference's beam-major (beam, batch, time)
    layout so host-side scoring sees [im0_b0..imN_b0, im0_b1, ...].

    With a mesh, the image batch is batch-sharded over the data axis and
    params replicated (declared via `in_shardings`, never device_put —
    CLAUDE.md); the decoded ids are gathered to the host for scoring, the
    encoder outputs stay device-resident for the train step.
    """
    h, w = config.cnn_input_size
    beam = int(config.scst_beam_size)
    steps = scst_decode_steps(config, vocab)
    augment = bool(config.cnn_input_augment)
    preprocess = preprocess_for(config.cnn_name)

    # traced shapes are GLOBAL under jit: the VMEM-spill fence needs the
    # data-parallel shard count to judge the per-device footprint
    dp = mesh.size if mesh is not None else 1

    def rollout(params, images_u8, key):
        images = preprocess(images_u8, key, h, w, augment)
        im_embed, fmaps = encode_images(
            params["encoder"], images, spec.cnn_name, spec.fm_endpoint,
            legacy=spec.legacy, dtype=spec.compute_dtype)
        memory = precompute(params["decoder"]["attention"],
                            spec.decoder.attention, fmaps,
                            dtype=spec.compute_dtype)
        # early_exit: stop each decode once every row/beam emitted EOS
        # (output-identical to the fixed-length scan; the reference's
        # dynamic_decode also stops). Early in training captions rarely
        # finish, so this costs ~nothing then and pays as they shorten.
        greedy = greedy_or_sample_from_memory(
            params["decoder"], spec, im_embed, memory, max_steps=steps,
            collect_alignments=False, early_exit=True, dp_shards=dp)
        _, all_beams = beam_search_from_memory(
            params["decoder"], spec, im_embed, memory, beam_size=beam,
            max_steps=steps, length_penalty=0.0, collect_alignments=False,
            early_exit=True, dp_shards=dp)
        return greedy.ids, all_beams["ids"], im_embed, fmaps

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS, batch_sharding, replicated

        bsh = batch_sharding(mesh)
        # beam_ids are beam-major (beam, batch, time): batch is axis 1.
        # Outputs are PINNED batch-sharded so multi-host local_batch sees
        # disjoint contiguous per-host blocks (it raises otherwise).
        beam_sh = NamedSharding(mesh, P(None, DATA_AXIS))
        return jax.jit(rollout,
                       in_shardings=(replicated(mesh), bsh, None),
                       out_shardings=(bsh, beam_sh, bsh, bsh))
    return jax.jit(rollout)


def make_scst_train_step(spec: ModelSpec, config: Config, optimizer, mask,
                         mesh=None):
    """(state, im_embed, fmaps, hypo_ids, rewards, rng) -> (state, metrics).

    im_embed/fmaps are per-image; they are beam-repeated ON DEVICE to match
    the hypothesis rows. hypo_ids/rewards are IMAGE-MAJOR (row i*beam + k =
    image i, hypothesis k) — unlike the reference's beam-major scoring
    layout — because image-major rows keep each image's hypotheses next to
    its encoder outputs: batch sharding needs no all-gather for the repeat,
    and each host's rows stay contiguous for multi-host reassembly
    (_finish_step converts from the scorer's beam-major layout).

    With a mesh, encoder outputs (already device-resident, batch-sharded by
    the rollout) and the host-scored hypothesis ids/rewards all shard on
    their leading axis; XLA inserts the gradient all-reduce.
    """
    beam = int(config.scst_beam_size)
    map_scale = float(config.rnn_map_loss_scale)
    l2_decay = float(config.l2_decay)

    def loss_fn(params, im_embed, fmaps, hypo_ids, rewards, rng):
        # image-major repeat: rows i*beam..(i+1)*beam-1 are image i
        im_k = jnp.repeat(im_embed, beam, axis=0)
        fm_k = jnp.repeat(fmaps, beam, axis=0)
        inputs, targets, m = process_captions(hypo_ids)
        logits, alignments = teacher_forced(
            params["decoder"], spec.decoder, inputs, im_k, fm_k,
            rng=rng, training=True, dtype=spec.compute_dtype)
        per_example = sequence_loss(logits, targets, m,
                                    average_across_batch=False)
        xe = jnp.mean(per_example * rewards)
        # batch-max decode span, like the reference's dynamic_decode (see
        # the identical masking in xe.py loss_fn)
        map_loss = attention_map_loss(alignments, map_scale,
                                      valid_steps=jnp.max(jnp.sum(m,
                                                                  axis=1)))
        reg = masked_l2_loss(params, mask, l2_decay)
        total = xe + map_loss + reg
        return total, {"scst_loss": xe, "map_loss": map_loss, "reg": reg}

    def train_step(state: TrainState, im_embed, fmaps, hypo_ids, rewards,
                   rng):
        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, im_embed, fmaps, hypo_ids, rewards, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return (TrainState(params, opt_state, state.step + 1),
                dict(parts, total_loss=total))

    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        bsh = batch_sharding(mesh)
        return jax.jit(train_step, donate_argnums=(0,),
                       in_shardings=(None, bsh, bsh, bsh, bsh, None))
    return jax.jit(train_step, donate_argnums=(0,))


def score_and_encode(
    scorer: CaptionScorer, config: Config, vocab: Vocabulary,
    refs: List[List[str]], greedy_ids: np.ndarray, beam_ids: np.ndarray,
    width: int,
) -> Tuple[np.ndarray, np.ndarray, Dict[str, float]]:
    """Host side of one SCST step: ids -> strings -> rewards -> padded ids."""
    base = config.radix_base
    greedy_caps = ids_to_captions(greedy_ids, config.token_type, vocab, base)
    beam, batch = beam_ids.shape[0], beam_ids.shape[1]
    flat = beam_ids.reshape(beam * batch, -1)
    sample_caps = ids_to_captions(flat, config.token_type, vocab, base)
    # scorer API wants list-of-singleton-lists
    hypos, sc_sample, sc_greedy = scorer.get_hypo_scores(
        refs, [[c] for c in sample_caps], [[c] for c in greedy_caps])
    rewards = (sc_sample - sc_greedy).astype(np.float32)
    hypo_ids = caption_strings_to_batched_ids(
        [h[0] for h in hypos], config.token_type, vocab, base)
    fixed = np.full((hypo_ids.shape[0], width), -1, np.int32)
    fixed[:, : min(width, hypo_ids.shape[1])] = hypo_ids[:, :width]
    metrics = {"score_sample": float(np.mean(sc_sample)),
               "score_greedy": float(np.mean(sc_greedy)),
               "reward": float(np.mean(rewards))}
    return fixed, rewards, metrics


def train_fn_scst(config: Config, *,
                  max_steps_override: Optional[int] = None
                  ) -> Dict[str, float]:
    """The SCST stage driver (train_fn.py:150-307)."""
    vocab = _resolve_vocab(config)
    spec = build_model_spec(config, vocab)
    pipe = ScstPipeline(config, vocab)
    if max_steps_override is not None:
        config.max_step = max_steps_override
    max_step = int(config.max_step)

    # scst-words IDF cache (train_fn.py:192-201)
    idf_path = config.get("scst_idf_path")
    if not idf_path:
        cand = os.path.join(
            config.dataset_dir, "captions",
            config.dataset_file_pattern.format("scst-words") + ".p")
        idf_path = cand if os.path.exists(cand) else None
    weights = {"ciderD": float(config.scst_weight_ciderD),
               "bleu": list(config.scst_weight_bleu)}
    scorer = CaptionScorer(idf_path, weights)
    if idf_path is None:
        # corpus-mode CIDEr-D: df computed per batch from its refs
        print("WARNING: no scst-words IDF cache found; CIDEr-D uses "
              "per-batch corpus document frequencies.")

    params = init_params(jax.random.PRNGKey(config.rand_seed), spec)
    schedule = cosine_schedule(config.lr_start, config.lr_end, max_step)
    optimizer, mask = build_optimizer(
        params, schedule, optimiser=config.optimiser,
        adam_epsilon=config.adam_epsilon,
        freeze_scopes=config.freeze_scopes,
        clip_gradient_norm=config.clip_gradient_norm)
    opt_state = optimizer.init(params)
    params, opt_state, start_step, mode = ckpt.restore_model(
        params, config.checkpoint_path,
        resume=bool(config.resume_training),
        exclude_scopes=config.checkpoint_exclude_scopes,
        opt_state=opt_state)
    print(f"INFO: restore mode = {mode}, start step = {start_step}")

    os.makedirs(config.log_path, exist_ok=True)
    config.save(config.log_path)

    from ..parallel.mesh import (make_mesh_for_batch, replicate,
                                 start_host_fetch)

    mesh = make_mesh_for_batch(
        config.batch_size_train,
        limit=int(config.get("num_data_shards") or 0))
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    state = TrainState(params, opt_state,
                       jnp.asarray(start_step, jnp.int32))

    rollout = make_rollout(spec, config, vocab, mesh=mesh)
    train_step = make_scst_train_step(spec, config, optimizer, mask,
                                      mesh=mesh)
    width = hypo_width(config, vocab)
    writer = SummaryWriter(config.log_path)
    saver = ckpt.make_saver(getattr(config, "checkpoint_backend",
                                    "msgpack"))
    save_every = max(pipe.config.split_sizes["train"]
                     // config.batch_size_train, 1)

    rng = jax.random.PRNGKey(config.rand_seed + 2)
    step = start_step
    data_iter = iter(pipe)
    ov = config.get("scst_overlap")
    overlap = True if ov is None else bool(ov)
    pending = None  # (rollout outputs, refs) for software pipelining
    metrics: Dict[str, float] = {}
    t_last, n_since = time.time(), 0
    while step < max_step:
        rng, k_roll, k_train = jax.random.split(rng, 3)
        # overlapped mode finishes the PREVIOUS rollout each iteration, so
        # once the pending one will land on the final step there is
        # nothing left to dispatch — rolling out unconditionally would
        # train max_step+1 steps (one past the reference's schedule) and
        # waste a rollout
        need_rollout = (not overlap
                        or step + (1 if pending is not None else 0)
                        < max_step)
        if need_rollout:
            images, refs = next(data_iter)
            if jax.process_count() > 1:
                # the SCST pipeline is NOT process-sharded (host scoring
                # needs the full batch's refs — host_score_shard); each
                # host contributes its contiguous image block, since
                # multi-process jit rejects per-host numpy against the
                # sharded global mesh. The host-local rng key (identical
                # value everywhere, same seed) replicates globally.
                from ..parallel.mesh import feed_global, replicate

                images = feed_global(mesh, images)
                k_roll = replicate(mesh, k_roll)
            # raw numpy in: jit shards + transfers per its in_shardings
            out = rollout(state.params, images, k_roll)
            _start_ids_fetch(out)
        if not overlap:
            # strict on-policy: score + train on THIS batch before the
            # next rollout (reference schedule, no staleness, no overlap)
            state, metrics, step = _finish_step(
                (out, refs), state, train_step, scorer, config, vocab,
                width, k_train, step, mesh=mesh)
            n_since += config.batch_size_train
        else:
            if pending is not None:
                state, metrics, step = _finish_step(
                    pending, state, train_step, scorer, config, vocab,
                    width, k_train, step, mesh=mesh)
                n_since += config.batch_size_train
            pending = (out, refs) if need_rollout else None

        if step > 0 and step % 25 == 0 and metrics:
            # one async fetch batch for all device scalars, then the
            # writer's float()s find the values already on host (a
            # per-scalar sync is a full round trip each — CLAUDE.md)
            start_host_fetch(*metrics.values())
            dt = time.time() - t_last
            writer.scalars(step, dict(
                metrics, examples_per_sec=n_since / max(dt, 1e-9)))
            print(f"scst step {step}/{max_step} reward "
                  f"{metrics.get('reward', 0):.4f} "
                  f"{n_since / max(dt, 1e-9):.1f} ex/s")
            t_last, n_since = time.time(), 0
        if step > 0 and step % save_every == 0:
            saver.save(config.log_path, step, state.params,
                       state.opt_state, max_saves=config.max_saves)

    if pending is not None:
        rng, k_train = jax.random.split(rng)
        state, metrics, step = _finish_step(
            pending, state, train_step, scorer, config, vocab, width,
            k_train, step, mesh=mesh)
    saver.save(config.log_path, step, state.params, state.opt_state,
               max_saves=config.max_saves)
    saver.close()
    writer.close()
    start_host_fetch(*metrics.values())
    return {k: float(v) for k, v in metrics.items()}


def _start_ids_fetch(out) -> None:
    """Kick off the device->host copy of the decoded ids right after the
    rollout dispatch, so the later np.asarray in host_score_shard finds
    the bytes already on host instead of paying a synchronous ~40 ms
    tunnel round trip (the r3 loop bench's dominant cost)."""
    from ..parallel.mesh import start_host_fetch

    start_host_fetch(*out[:2])  # greedy_ids, beam_ids


def host_score_shard(greedy_ids, beam_ids, refs, scorer, config, vocab,
                     width, mesh=None):
    """Host scoring half of one SCST step -> (hypo_ids, rewards, metrics).

    Multi-host (SURVEY §7 step 8): each host pulls only ITS addressable
    shard of the decoded ids (`local_batch`), scores rewards for its images
    against ITS slice of the references (the pipeline is not
    process-sharded, so every host holds the full batch's refs and slices
    by its contiguous device-row block), and contributes its rows back as a
    batch-sharded global array (`global_batch`) — no cross-host caption
    traffic. The scorer works beam-major (reference layout,
    model_base.py:286-288); rows are reordered IMAGE-major before the train
    step so per-host blocks stay contiguous (see make_scst_train_step).
    Single-host the gather helpers are identity.

    Exercised for real across 2 jax.distributed processes by
    tests/test_multihost.py.
    """
    import jax as _jax

    from ..parallel.mesh import global_batch, local_batch, local_batch_start

    n_proc = _jax.process_count()
    if n_proc > 1:
        # contiguous per-host row block of the global batch
        n_local = len(refs) // n_proc
        lo = _jax.process_index() * n_local
        # the refs slice below assumes this host's device rows ARE the
        # global block [lo, lo+n_local); verify against the real shard
        # layout so a surprising mesh/device order fails loudly instead of
        # scoring against the wrong images' references
        got = local_batch_start(greedy_ids)
        if got != lo:
            raise ValueError(
                f"multi-host SCST: process {_jax.process_index()} holds "
                f"device rows starting at {got}, expected {lo}; mesh "
                "device order does not match the process-contiguous "
                "assumption (build the mesh from jax.devices() order).")
        refs = refs[lo: lo + n_local]
    hypo_ids, rewards, score_metrics = score_and_encode(
        scorer, config, vocab, refs, local_batch(greedy_ids),
        local_batch(beam_ids, axis=1), width)
    # scorer output is beam-major (row k*B + i); train step wants
    # image-major (row i*K + k)
    beam = int(config.scst_beam_size)
    b_local = hypo_ids.shape[0] // beam
    hypo_ids = hypo_ids.reshape(beam, b_local, -1).transpose(1, 0, 2) \
        .reshape(beam * b_local, -1)
    rewards = rewards.reshape(beam, b_local).T.reshape(-1)
    if mesh is not None:
        hypo_ids = global_batch(mesh, hypo_ids)
        rewards = global_batch(mesh, rewards)
    return hypo_ids, rewards, score_metrics


def _finish_step(pending, state, train_step, scorer, config, vocab, width,
                 k_train, step, mesh=None):
    """Host half of one SCST step: score the pending rollout
    (host_score_shard), then dispatch the reward-weighted train step."""
    (greedy_ids, beam_ids, im_embed, fmaps), refs = pending
    hypo_ids, rewards, score_metrics = host_score_shard(
        greedy_ids, beam_ids, refs, scorer, config, vocab, width, mesh=mesh)
    import jax as _jax

    if _jax.process_count() > 1:
        # host-local rng key -> globally replicated (same value everywhere)
        from ..parallel.mesh import replicate

        k_train = replicate(mesh, k_train)
    state, metrics = train_step(state, im_embed, fmaps, hypo_ids,
                                rewards, k_train)
    # keep train metrics as device scalars: a per-step float() costs a
    # full tunnel round trip (~40 ms) on the axon backend — the r3 loop
    # bench showed the SCST step was latency-bound, not compute- or
    # scoring-bound. Conversion happens at the 25-step logging cadence
    # (writer.scalars floats) and at loop exit.
    metrics = dict(metrics)
    metrics.update(score_metrics)
    return state, metrics, step + 1
