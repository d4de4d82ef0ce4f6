"""Remat-policy sweep for the SCST train step (r2 verdict weak #5b).

Measures the reward-weighted SCST train step (70 rows, T=42 teacher-forced
scan) on the real TPU under different jax.checkpoint policies on the scan
body, using the pipelined-dispatch methodology (CLAUDE.md). Run alone —
never concurrently with bench.py (one tunneled chip).

Usage: python tools/remat_sweep.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship
    from bench import real_vocab
    from comic_tpu.models import decoder as dec_mod
    from comic_tpu.models.captioner import build_model_spec
    from comic_tpu.training.optimizer import build_optimizer
    from comic_tpu.training.schedule import cosine_schedule
    from comic_tpu.training.scst import hypo_width, make_scst_train_step
    from comic_tpu.training.xe import TrainState

    config, spec, params = _flagship()
    vocab = real_vocab()
    spec = build_model_spec(config, vocab)
    batch, beam = 10, int(config.scst_beam_size)
    config.batch_size_train = batch
    width = hypo_width(config, vocab)

    rng = np.random.default_rng(0)
    rows = batch * beam
    l = 196
    im_embed = jnp.asarray(rng.normal(size=(batch, 1024)).astype(np.float32))
    fmaps = jnp.asarray(rng.normal(size=(batch, l, 832)).astype(np.float32))
    hypo = np.full((rows, width), -1, np.int32)
    hypo[:, 0] = spec.decoder.start_id
    hypo[:, 1:width - 1] = rng.integers(0, config.radix_base,
                                        (rows, width - 2))
    hypo[:, width - 1] = spec.decoder.end_id
    hypo = jnp.asarray(hypo)
    rewards = jnp.asarray(rng.normal(size=rows).astype(np.float32))
    key = jax.random.PRNGKey(0)

    cp = jax.checkpoint_policies
    policies = {
        "dots_saveable": cp.dots_saveable,
        "dots_no_batch_dims": cp.dots_with_no_batch_dims_saveable,
        "nothing_saveable": cp.nothing_saveable,
        "everything_saveable": cp.everything_saveable,
    }
    default = dec_mod.REMAT_POLICY
    for name, policy in policies.items():
        if policy is default:
            print(f"current default: {name}")
    optimizer, mask = build_optimizer(
        params, cosine_schedule(config.lr_start, config.lr_end, 1000),
        adam_epsilon=config.adam_epsilon, freeze_scopes=config.freeze_scopes)

    # XE operating point: batch 32, full images through the frozen CNN
    from comic_tpu.training.xe import make_train_step

    xe_batch = 32
    images_u8 = jnp.asarray(rng.integers(
        0, 256, (xe_batch, 256, 256, 3), dtype=np.uint8))
    xe_width = 2 * 13 + 2
    caps = np.full((xe_batch, xe_width), -1, np.int32)
    caps[:, 0] = spec.decoder.start_id
    caps[:, 1:27] = rng.integers(0, config.radix_base, (xe_batch, 26))
    caps[:, 27] = spec.decoder.end_id
    caps = jnp.asarray(caps)

    def timed(step_fn, iters=20):
        out = None
        for _ in range(3):
            out = step_fn()
        np.asarray(out)
        t0 = time.time()
        for _ in range(iters):
            out = step_fn()
        np.asarray(out)
        return (time.time() - t0) * 1e3 / iters

    for name, policy in policies.items():
        dec_mod.REMAT_POLICY = policy
        try:
            train_step = make_scst_train_step(spec, config, optimizer, mask)
            state_params = jax.tree_util.tree_map(jnp.array, params)
            state = TrainState(state_params, optimizer.init(state_params),
                               jnp.asarray(0, jnp.int32))
            holder = {"state": state}

            def scst_step():
                holder["state"], m = train_step(holder["state"], im_embed,
                                                fmaps, hypo, rewards, key)
                return m["total_loss"]

            scst_ms = timed(scst_step)

            config.batch_size_train = xe_batch
            xe_step = make_train_step(spec, config, optimizer, mask,
                                      tuple(config.cnn_input_size))
            state_params = jax.tree_util.tree_map(jnp.array, params)
            holder["state"] = TrainState(
                state_params, optimizer.init(state_params),
                jnp.asarray(0, jnp.int32))

            def xe_fn():
                holder["state"], m = xe_step(holder["state"], images_u8,
                                             caps, key)
                return m["total_loss"]

            xe_ms = timed(xe_fn)
            config.batch_size_train = batch
            print(f"{name:32s}: scst {scst_ms:7.2f} ms  xe {xe_ms:7.2f} ms")
        except Exception as e:
            print(f"{name:32s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
