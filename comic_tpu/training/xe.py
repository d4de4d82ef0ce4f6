"""Cross-entropy training: jitted train/eval steps and the stage driver.

TPU-native re-design of the reference XE driver
(/root/reference/src/train_fn.py:26-147 train_fn + model_base losses):
one jitted step fuses on-device image augmentation, the CNN forward, the
scanned decoder, the loss stack (XE + attention-map + masked L2), and the
optax update; parameters/optimizer state are donated so updates happen
in-place in HBM. Data parallelism is plain batch sharding over a 1-D mesh —
parameters are replicated and XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration import Config
from ..data.pipeline import TrainPipeline
from ..data.preprocessing import preprocess_for
from ..data import captions as cap_io
from ..models.captioner import (
    ModelSpec,
    attention_map_loss,
    build_model_spec,
    init_params,
    process_captions,
    xe_forward,
)
from ..models.layers import count_params
from ..parallel.mesh import (feed_global, global_batch,
                             make_mesh_for_batch, replicate)
from ..tokenization import Vocabulary, build_char_vocab
from ..utils.summaries import SummaryWriter
from . import checkpoints as ckpt
from .optimizer import build_optimizer, masked_l2_loss, path_string
from .schedule import cosine_schedule, legacy_halving_schedule

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


def _make_train_step_body(spec: ModelSpec, config: Config, optimizer, mask,
                          image_size: Tuple[int, int]):
    """The un-jitted fused step: (state, images_u8, captions, rng) ->
    (state, metrics). Shared by the single-step and scan-of-K wrappers."""
    h, w = image_size
    augment = bool(config.cnn_input_augment)
    preprocess = preprocess_for(config.cnn_name)
    map_scale = float(config.rnn_map_loss_scale)
    l2_decay = float(config.l2_decay)

    def loss_fn(params, images_u8, captions, rng, valid_steps=None):
        # frozen leaves become constants: with the whole CNN frozen (the
        # default decoder stage) autodiff prunes the entire conv backward
        # pass instead of computing grads the optimizer would zero anyway
        params = jax.tree_util.tree_map(
            lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask)
        k_aug, k_drop = jax.random.split(rng)
        images = preprocess(images_u8, k_aug, h, w, augment)
        log_ppl, aux = xe_forward(params, spec, images, captions,
                                  rng=k_drop, training=True)
        # The reference's dynamic_decode stops at the BATCH-MAX caption
        # length, so its map loss (model_base.py:355-365) never sees the
        # bucket-bound pad steps our static scan adds — mask them out.
        # scan-of-K additionally passes the sub-batch stack width; the
        # batch max is <= any such width, so min() keeps the fused path
        # bit-equal to the single dispatch.
        _, _, m = process_captions(captions)
        dyn_steps = jnp.max(jnp.sum(m, axis=1))
        if valid_steps is not None:
            dyn_steps = jnp.minimum(dyn_steps, valid_steps)
        map_loss = attention_map_loss(aux["alignments"], map_scale,
                                      valid_steps=dyn_steps)
        reg = masked_l2_loss(params, mask, l2_decay)
        total = log_ppl + map_loss + reg
        return total, {"log_ppl": log_ppl, "map_loss": map_loss, "reg": reg}

    add_vars = bool(config.add_vars_summaries)
    add_grads = bool(config.add_grad_summaries)

    def _scope_norms(tree, prefix):
        # per-top-scope global norms, the lean equivalent of the reference's
        # per-variable histograms (train_fn.py:95-106)
        import optax

        return {f"{prefix}_norm/{k}": optax.global_norm(v)
                for k, v in tree.items()}

    def train_step(state: TrainState, images_u8, captions, rng,
                   valid_steps=None):
        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images_u8, captions, rng, valid_steps)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        metrics = dict(parts, total_loss=total)
        # learned attention temperature, logged like the reference's
        # 'softmax_temperatures' summary collection (model.py:70-71)
        temp = params["decoder"]["attention"].get("softmax_temperature")
        if temp is not None:
            metrics["softmax_temperature"] = temp
        if add_vars:
            metrics.update(_scope_norms(params, "vars"))
        if add_grads:
            metrics.update(_scope_norms(grads, "grads"))
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_train_step(spec: ModelSpec, config: Config, optimizer, mask,
                    image_size: Tuple[int, int], mesh=None):
    """Build the fused jitted train step.

    (state, images_u8, captions, rng) -> (state, metrics)

    With a mesh, batch inputs are declared batch-sharded via `in_shardings`
    so jit performs the (async) sharded host->device transfer itself —
    calling `jax.device_put` with a NamedSharding from the host loop
    serializes against queued device work and is ~50x slower per step.
    """
    train_step = _make_train_step_body(spec, config, optimizer, mask,
                                       image_size)
    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        bsh = batch_sharding(mesh)
        return jax.jit(train_step, donate_argnums=(0,),
                       in_shardings=(None, bsh, bsh, None))
    return jax.jit(train_step, donate_argnums=(0,))


def make_train_multi_step(spec: ModelSpec, config: Config, optimizer, mask,
                          image_size: Tuple[int, int],
                          steps_per_call: int, mesh=None):
    """K fused train steps per host dispatch via `lax.scan`
    (config.train_steps_per_call; no reference equivalent — TF1 pays one
    sess.run per step).

    (state, images_u8 (K,B,H,W,3), captions (K,B,T), keys (K,2) uint32,
     widths (K,)) -> (state, metrics of the LAST step)

    One host dispatch per K steps amortizes per-call dispatch/RPC overhead
    — on the axon-tunneled v5e a dispatch floors at ~3-4 ms (CLAUDE.md),
    comparable to the whole b32 step, so K=8 cuts measured step time
    substantially. Stacked captions must share one padded width; the
    per-element `widths_k` (each batch's own bucket width) keeps both
    losses identical to the single-step dispatch — XE pads are masked by
    the caption mask, the map loss by valid_steps.
    """
    body = _make_train_step_body(spec, config, optimizer, mask, image_size)

    def multi_step(state, images_k, caps_k, keys_k, widths_k):
        def scan_body(st, xs):
            im, cap, key, width = xs
            # decode steps for this batch's own bucket = width - 1
            st, metrics = body(st, im, cap, key, width - 1)
            return st, metrics
        state, ms = jax.lax.scan(scan_body, state,
                                 (images_k, caps_k, keys_k, widths_k))
        return state, jax.tree_util.tree_map(lambda m: m[-1], ms)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        bsh1 = NamedSharding(mesh, P(None, DATA_AXIS))  # batch is axis 1
        return jax.jit(multi_step, donate_argnums=(0,),
                       in_shardings=(None, bsh1, bsh1, None, None))
    return jax.jit(multi_step, donate_argnums=(0,))


def _write_model_size(log_path: str, subtree: Params, scope: str) -> None:
    """model_size.txt in the reference's format (ops.get_model_size,
    common/ops.py:62-91): an INFO line with the total, then one
    'name\\r\\nshape' stanza per variable. The README's 'Decoder params'
    column is read from this artifact."""
    entries = []

    def walk(path, leaf):
        shape = list(np.asarray(leaf).shape)
        entries.append((path_string(path), shape))
        return leaf

    jax.tree_util.tree_map_with_path(walk, subtree)
    total = sum(int(np.prod(s)) if s else 1 for _, s in entries)
    mssg = (f"\r\nINFO: Scope `{scope}` contains {total:,d} trainable "
            f"parameters.\r\n\r\n")
    for name, shape in sorted(entries):
        mssg += f"{scope}/{name}\r\n{shape}\r\n\r\n"
    mssg += "\r\n\r\n"
    with open(os.path.join(log_path, "model_size.txt"), "a") as f:
        f.write(mssg)


def make_eval_step(spec: ModelSpec, config: Config,
                   image_size: Tuple[int, int], mesh=None):
    """Eval-ppl step on the TRAIN mesh (params live there).

    The reference eval batch (61) is prime, so it can't shard over a
    multi-device mesh; rather than collapsing the whole run to 1 device
    (round-1 behavior), the eval batch is replicated across the train mesh
    when it doesn't divide — eval is rare (once per checkpoint) and small,
    training throughput is what matters.
    """
    h, w = image_size
    preprocess = preprocess_for(config.cnn_name)

    def eval_step(params, images_u8, captions):
        images = preprocess(images_u8, jax.random.PRNGKey(0), h, w,
                            False)
        log_ppl, _ = xe_forward(params, spec, images, captions,
                                training=False)
        return log_ppl

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        bsh = (batch_sharding(mesh)
               if int(config.batch_size_eval) % mesh.devices.size == 0
               else replicated(mesh))
        return jax.jit(eval_step,
                       in_shardings=(replicated(mesh), bsh, bsh))
    return jax.jit(eval_step)


def evaluate_perplexity(eval_step, params, pipeline, mesh=None) -> float:
    """Mean eval log-perplexity over one pass (train_fn.py:320-338).

    Dispatches the whole pass pipelined and converts to host floats only
    at the end: a per-batch float() would pay the ~3.8 ms dispatch floor
    of the tunneled backend x eval batches at every checkpoint
    (CLAUDE.md per-dispatch-floor note).

    Multi-process: the eval pipeline is NOT process-sharded (every host
    loads the identical batch, same seed), so each host contributes its
    contiguous block via feed_global — jit rejects per-host numpy against
    the sharded global mesh."""
    import jax as _jax

    # conversion needed only when the eval jit is batch-sharded (mirrors
    # make_eval_step's divisibility fallback: with REPLICATED in_shardings
    # per-host numpy is still legal multi-process)
    multiproc = (_jax.process_count() > 1 and mesh is not None
                 and pipeline.batch_size % mesh.devices.size == 0)
    losses = []
    for images, caps in pipeline.epoch():
        if multiproc:
            images = feed_global(mesh, images)
            caps = feed_global(mesh, caps)
        # raw numpy in: jit shards + transfers per its in_shardings
        losses.append(eval_step(params, images, caps))
        # Bound in-flight staged batches: without an occasional sync the
        # number of queued host->device transfers grows with eval-set
        # size (only the PJRT inflight cap would contain it). One sync
        # per 32 dispatches keeps the pipeline while capping buffers.
        if len(losses) % 32 == 0:
            np.asarray(losses[-1])
    if not losses:
        return float("nan")
    # one stacked transfer instead of a per-scalar sync (each sync is a
    # full tunnel round trip on this backend)
    return float(np.exp(np.mean(np.asarray(jnp.stack(losses)))))


def _resolve_vocab(config: Config) -> Vocabulary:
    if config.token_type == "char":
        return build_char_vocab()
    if config.wtoi:
        return Vocabulary.from_str_itow(config.wtoi, config.itow)
    v = cap_io.load_vocab(config.dataset_dir, config.dataset_file_pattern)
    config.wtoi = v.wtoi
    config.itow = {str(k): w for k, w in v.itow.items()}
    config.vocab_size = len(v.itow)
    return v


def train_fn(config: Config, *, max_steps_override: Optional[int] = None,
             mesh=None) -> Dict[str, float]:
    """The XE stage driver (decoder training and cnn_finetune).

    Returns final metrics. Artifacts written into config.log_path: config
    pickle, model_size.txt, events.jsonl, model-*/model_compact-* ckpts.
    """
    vocab = _resolve_vocab(config)
    spec = build_model_spec(config, vocab)

    train_pipe = TrainPipeline(config, vocab, "train")
    eval_pipe = TrainPipeline(config, vocab, "valid")
    if max_steps_override is not None:
        config.max_step = max_steps_override
    max_step = int(config.max_step)
    steps_per_epoch = max(train_pipe.steps_per_epoch, 1)

    key = jax.random.PRNGKey(config.rand_seed)
    params = init_params(key, spec)

    if config.legacy:
        schedule = legacy_halving_schedule(
            config.lr_start, steps_per_epoch,
            config.lr_reduce_every_n_epochs, lr_end=config.lr_end)
    else:
        schedule = cosine_schedule(config.lr_start, config.lr_end, max_step)
    optimizer, mask = build_optimizer(
        params, schedule,
        optimiser=config.optimiser,
        adam_epsilon=config.adam_epsilon,
        freeze_scopes=config.freeze_scopes,
        cnn_grad_multiplier=config.cnn_grad_multiplier,
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
    n_dec = count_params(params["decoder"])
    n_all = count_params(params)
    _write_model_size(config.log_path, params["decoder"], "decoder")
    print(f"INFO: decoder params {n_dec:,d} / total {n_all:,d}")

    if mesh is None:
        # train mesh sized by the TRAIN batch only — the reference eval
        # batch (61, prime) must not collapse the train mesh to 1 device;
        # the eval step shards on its own mesh. Multi-process: one step's
        # GLOBAL batch is batch_size_train rows from EACH host.
        mesh = make_mesh_for_batch(
            config.batch_size_train * jax.process_count(),
            limit=int(config.get("num_data_shards") or 0))
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    state = TrainState(params, opt_state,
                       jnp.asarray(start_step, jnp.int32))

    spc = max(int(config.get("train_steps_per_call") or 1), 1)
    train_step = make_train_step(spec, config, optimizer, mask,
                                 tuple(config.cnn_input_size), mesh=mesh)
    multi_step = (make_train_multi_step(
        spec, config, optimizer, mask, tuple(config.cnn_input_size),
        spc, mesh=mesh) if spc > 1 else None)
    eval_step = make_eval_step(spec, config, tuple(config.cnn_input_size),
                               mesh=mesh)

    writer = SummaryWriter(config.log_path)
    saver = ckpt.make_saver(getattr(config, "checkpoint_backend",
                                    "msgpack"))
    log_every = max(steps_per_epoch // max(config.num_logs_per_epoch, 1), 1)
    # checkpoint each epoch, or twice per epoch for huge epochs
    save_every = (steps_per_epoch if steps_per_epoch <= 5000
                  else steps_per_epoch // 2)

    from ..utils.profiling import StepTracer

    tracer = StepTracer(config.get("profile_dir"))
    rng = jax.random.PRNGKey(config.rand_seed + 1)
    step = start_step
    t_last, n_since = time.time(), 0
    data_iter = iter(train_pipe)
    metrics = {}
    logged_image = not bool(config.add_image_summaries)
    while step < max_step:
        images, caps = next(data_iter)
        if not logged_image:
            # one preprocessed sample per run, like the reference's
            # tf.summary.image of the input batch (train_fn.py:75)
            h_, w_ = config.cnn_input_size
            prev = preprocess_for(config.cnn_name)(
                jnp.asarray(images[:1]), jax.random.PRNGKey(0), h_, w_,
                False)
            arr = np.asarray(prev[0], np.float32)
            lo, hi = float(arr.min()), float(arr.max())
            arr = (arr - lo) / max(hi - lo, 1e-6) * 255.0
            writer.image(step, "input_image", arr.astype(np.uint8))
            logged_image = True
        rng, sub = jax.random.split(rng)
        prev_step = step
        # multi-PROCESS feeding: jit rejects per-host numpy against a
        # non-trivially sharded global mesh; each host's pipeline block
        # (pipeline._make_batch) becomes its shard of a global array.
        # Single-process (incl. the 8-virtual-device dryrun) keeps the
        # raw-numpy fast path: jit shards + transfers asynchronously per
        # in_shardings (see make_train_step; CLAUDE.md hot-loop rule).
        multiproc = jax.process_count() > 1
        if multi_step is not None and step + spc <= max_step:
            # collect K-1 more batches and run them all in ONE dispatch;
            # caption buckets differ in width, so pad the stack to the
            # widest (PAD=-1 rows are masked out of the loss)
            ims, cps = [images], [caps]
            for _ in range(spc - 1):
                im2, cp2 = next(data_iter)
                ims.append(im2)
                cps.append(cp2)
            widths = np.asarray([c.shape[1] for c in cps], np.int32)
            width = int(widths.max())
            cps = [np.pad(c, ((0, 0), (0, width - c.shape[1])),
                          constant_values=-1) for c in cps]
            keys = jax.random.split(sub, spc)
            ims_k, cps_k = np.stack(ims), np.stack(cps)
            if multiproc:
                # stacked (K, B, ...) batches shard on axis 1; the rng
                # keys are host-local jax arrays (same value on every
                # host, identical seed) and must be replicated globally
                ims_k = global_batch(mesh, ims_k, axis=1)
                cps_k = global_batch(mesh, cps_k, axis=1)
                keys = replicate(mesh, keys)
            state, metrics = multi_step(state, ims_k, cps_k, keys, widths)
            step += spc
            # examples/sec counts GLOBAL rows: each host's stack holds its
            # local block, so scale by process count under multi-process
            n_since += (sum(im.shape[0] for im in ims)
                        * (jax.process_count() if multiproc else 1))
        else:
            n_since += (images.shape[0]
                        * (jax.process_count() if multiproc else 1))
            if multiproc:
                images = global_batch(mesh, images)
                caps = global_batch(mesh, caps)
                sub = replicate(mesh, sub)
            state, metrics = train_step(state, images, caps, sub)
            step += 1

        if (step // log_every) != (prev_step // log_every) or step == max_step:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t_last
            m["examples_per_sec"] = n_since / max(dt, 1e-9)
            m["lr"] = float(schedule(jnp.asarray(step)))
            writer.scalars(step, m)
            print(f"step {step}/{max_step}  loss {m['total_loss']:.4f}  "
                  f"ppl {np.exp(m['log_ppl']):.2f}  "
                  f"{m['examples_per_sec']:.1f} ex/s")
            t_last, n_since = time.time(), 0

        tracer.step(step)
        if ((step // save_every) != (prev_step // save_every)
                or step == max_step):
            # serialization + IO happen on the saver thread; only the
            # device->host snapshot blocks the loop
            saver.save(config.log_path, step, state.params,
                       state.opt_state, max_saves=config.max_saves)
            eval_ppl = evaluate_perplexity(eval_step, state.params,
                                           eval_pipe, mesh=mesh)
            writer.scalars(step, {"eval_perplexity": eval_ppl})
            print(f"step {step}: eval perplexity {eval_ppl:.3f}")

    tracer.close()
    saver.close()
    writer.close()
    out = {k: float(v) for k, v in metrics.items()} if metrics else {}
    return out
