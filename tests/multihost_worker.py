"""Worker for the genuine 2-process jax.distributed test.

Launched by tests/test_multihost.py as two separate Python processes, each
with 4 virtual CPU devices (8 global). Exercises, with REAL cross-process
arrays (not monkeypatched shards):

  1. the COMIC_COORDINATOR bootstrap (parallel/distributed.py);
  2. per-host training-record sharding (data/pipeline.py TrainPipeline);
  3. a jitted DP gradient over the global mesh — a real cross-host
     all-reduce — vs the full-batch host computation;
  4. local_batch / local_batch_start / global_batch round trips on
     batch-sharded jit outputs;
  5. the SCST host scoring half (training/scst.host_score_shard) on
     sharded greedy/beam rollouts vs the single-process result computed
     from the same global data.

Writes a JSON result file; any assertion failure propagates as a non-zero
exit code with the traceback on stderr.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Bootstrap BEFORE anything that can initialize the XLA backend (even
# jax.devices() in a transitively imported module poisons it).
from comic_tpu.parallel.distributed import (  # noqa: E402
    maybe_initialize_distributed,
)

_BOOTSTRAPPED = maybe_initialize_distributed()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(out_path):
    from comic_tpu.configuration import Config
    from comic_tpu.data.pipeline import TrainPipeline
    from comic_tpu.evaluation.ngrams import build_idf_cache, save_idf_cache
    from comic_tpu.evaluation.scorers import CaptionScorer
    from comic_tpu.parallel.mesh import (
        batch_sharding,
        global_batch,
        local_batch,
        local_batch_start,
        make_mesh,
        replicated,
    )
    from comic_tpu.tokenization import EOS, GO, PAD, UNK, Vocabulary
    from comic_tpu.training.scst import host_score_shard, score_and_encode
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert _BOOTSTRAPPED, "bootstrap did not run"
    pid, n_proc = jax.process_index(), jax.process_count()
    assert n_proc == 2, n_proc
    assert jax.local_device_count() == 4
    assert len(jax.devices()) == 8
    mesh = make_mesh()  # all 8 global devices

    # --- 2. per-host record sharding --------------------------------------
    words = [f"w{i}" for i in range(10)]
    records = [(f"img_{i}.jpg", ["<GO> " + " ".join(
        words[(i + j) % 10] for j in range(4)) + " <EOS>"])
        for i in range(12)]
    wtoi = {PAD: -1}
    for i, w in enumerate(words):
        wtoi[w] = i
    wtoi[UNK], wtoi[GO], wtoi[EOS] = 10, 11, 12
    vocab = Vocabulary(wtoi)
    config = Config(token_type="word", batch_size_train=2, max_epoch=1,
                    scst_beam_size=2)
    pipe = TrainPipeline(config, vocab, "train",
                         records=[(f, c[0]) for f, c in records])
    # records stay GLOBAL on every host (identical shuffle order + bucket
    # widths); each host materializes its contiguous BLOCK of every
    # global batch of batch_size * n_proc indices (_make_batch)
    assert pipe.records == [(f, c[0]) for f, c in records], \
        "records must stay global on every host"
    assert pipe._n_proc == 2 and pipe._pid == pid
    batches = list(pipe._batches_of_indices())
    assert batches and all(len(b) == 2 * 2 for b in batches), \
        "training batches must hold batch_size * n_proc global indices"
    assert pipe.steps_per_epoch == 12 // (2 * 2)
    assert config.max_step == int(12 / (2 * 2) * config.max_epoch)

    # --- 3. real cross-host DP all-reduce ---------------------------------
    x_glob = np.arange(16 * 3, dtype=np.float32).reshape(16, 3) / 10.0
    x_local = x_glob[8 * pid: 8 * pid + 8]
    xg = global_batch(mesh, x_local)
    assert xg.shape == (16, 3)
    w = np.full((3,), 0.5, np.float32)

    def loss(w, x):
        return jnp.mean(jnp.sin(x @ w))

    grad_fn = jax.jit(jax.grad(loss),
                      in_shardings=(replicated(mesh), batch_sharding(mesh)),
                      out_shardings=replicated(mesh))
    g = np.asarray(grad_fn(w, xg))
    # host-side full-batch reference
    eps = 1e-4
    g_ref = np.array([
        (np.mean(np.sin(x_glob @ (w + eps * np.eye(3, dtype=np.float32)[i])))
         - np.mean(np.sin(x_glob @ (w - eps * np.eye(3,
                                                     dtype=np.float32)[i]))))
        / (2 * eps) for i in range(3)])
    np.testing.assert_allclose(g, g_ref, rtol=1e-3, atol=1e-5)

    # --- 4. local_batch round trip on a batch-sharded jit output ----------
    double = jax.jit(lambda x: x * 2.0,
                     in_shardings=(batch_sharding(mesh),),
                     out_shardings=batch_sharding(mesh))
    y = double(xg)
    np.testing.assert_allclose(local_batch(y), 2.0 * x_local, rtol=1e-6)
    assert local_batch_start(y) == 8 * pid

    # --- 5. SCST host scoring half over sharded rollouts ------------------
    rng = np.random.default_rng(7)  # same seed -> same global data
    B, K, T = 8, 2, 6
    greedy_glob = rng.integers(0, 10, (B, T)).astype(np.int32)
    beam_glob = rng.integers(0, 10, (K, B, T)).astype(np.int32)
    refs_glob = [[" ".join(words[(i + j) % 10] for j in range(5)),
                  " ".join(words[(i * 2 + j) % 10] for j in range(4))]
                 for i in range(B)]
    idf_path = out_path + f".idf.{n_proc}.p"  # deterministic, same content
    save_idf_cache(idf_path, build_idf_cache(refs_glob))
    scorer = CaptionScorer(idf_path, {"ciderD": 1.0})

    greedy_sh = jax.make_array_from_process_local_data(
        batch_sharding(mesh), greedy_glob[4 * pid: 4 * pid + 4])
    beam_sh = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, "data")),
        beam_glob[:, 4 * pid: 4 * pid + 4])

    # the production rollout starts async host copies on these sharded
    # arrays before scoring — exercise that path on real 2-process shards
    from comic_tpu.parallel.mesh import start_host_fetch

    start_host_fetch(greedy_sh, beam_sh)

    width = 8
    hypo_g, rew_g, metrics = host_score_shard(
        greedy_sh, beam_sh, refs_glob, scorer, config, vocab, width,
        mesh=mesh)
    # single-process expectation from the same global data (identical
    # per-image scores: CIDEr-D with a fixed IDF cache is per-image)
    hypo_e, rew_e, _ = score_and_encode(
        scorer, config, vocab, refs_glob, greedy_glob,
        beam_glob, width)
    hypo_e = hypo_e.reshape(K, B, -1).transpose(1, 0, 2).reshape(K * B, -1)
    rew_e = rew_e.reshape(K, B).T.reshape(-1)
    # this host's shard of the assembled global arrays
    np.testing.assert_array_equal(
        local_batch(hypo_g), hypo_e[4 * K * pid: 4 * K * (pid + 1)])
    np.testing.assert_allclose(
        local_batch(rew_g), rew_e[4 * K * pid: 4 * K * (pid + 1)],
        rtol=1e-6)
    assert hypo_g.shape == (K * B, width) and rew_g.shape == (K * B,)

    # --- 6. REAL XE train_fn over the 2-process mesh -----------------------
    # The full driver: pipeline block-slicing -> mesh.global_batch feeding
    # (multi-process jit rejects per-host numpy) -> sharded fused train
    # step -> replicated-eval perplexity -> checkpoint save of replicated
    # global params. Both hosts run one SPMD program, so the final loss
    # must be bit-identical across processes (compared by the pytest side).
    from comic_tpu.data.synthetic import make_synthetic_dataset
    from comic_tpu.training.xe import train_fn

    root, _ = make_synthetic_dataset(
        out_path + f".data{pid}", num_train=16, num_valid=4, num_test=4,
        seed=11)  # deterministic content; per-process dirs, no write races
    c6 = Config(token_type="word", dataset_dir=root,
                dataset_file_pattern="synth_{}",
                batch_size_train=4,  # per host; global batch 8 = devices
                batch_size_eval=4, max_epoch=2, rnn_size=16,
                rnn_word_size=8, attn_num_heads=2, compute_dtype="float32",
                cnn_input_size=(64, 64), dropout_rnn_in=0.0,
                dropout_rnn_out=0.0, attn_keep_prob=1.0,
                log_path=out_path + f".exp{pid}", num_logs_per_epoch=1,
                rand_seed=0)
    xe_metrics = train_fn(c6, max_steps_override=3)
    assert np.isfinite(xe_metrics["total_loss"]), xe_metrics

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "n_proc": n_proc,
                   "reward_mean": float(metrics["reward"]),
                   "xe_loss": float(xe_metrics["total_loss"]),
                   "ok": True}, f)


if __name__ == "__main__":
    main(sys.argv[1])
