"""Overfit-convergence gate: caption QUALITY, not just loss direction.

The reference proves its training works via published scores
(/root/reference/README.md:221-226); no real data can enter this image,
so the strongest in-env proxy is memorization: train COMIC-tiny on a
10-image synthetic fixture through the REAL `train_fn`, then run the
REAL infer CLI (restore -> beam decode -> PTB tokenize -> CIDEr) on a
test split that mirrors the train split, and gate on the score. A model
whose learning dynamics are wrong anywhere (LR schedule sign/scale,
masks, map loss, teacher forcing, optimizer wiring, checkpoint
round-trip, decode) cannot reach CIDEr > 5 on this fixture; a healthy
one measures ~8 (ceiling ~10 when every caption is exact).

Fixture notes (measured while deriving the recipe, r4):
- `distinct_images=True` is load-bearing: a random crop of a NOISE image
  is an unrelatable patch, so image->caption memorization is impossible
  and training converges only to the language-model floor (CIDEr ~0.2).
  Solid-colour images survive the train-time crop/flip augmentation.
- The frozen CNN (default `freeze_scopes="encoder/cnn"`, mirroring the
  reference's stage-1 decoder training, src/train.py:233-240) is also
  load-bearing: with 5.6M CNN params unfrozen, Adam's scale invariance
  turns tiny noisy encoder gradients into full-LR parameter motion and
  the features the decoder memorizes against never stop moving.
- Dropout off: with 10 images the regularizer fights memorization.

The SCST leg continues from the XE checkpoint through the real
`train_fn_scst` (rollout -> host CIDEr-D reward -> policy-gradient step)
and asserts the reward signal is sane and caption quality is not
destroyed — the sign/scale proxy for the reference's stage-3 gains.
"""

import os

import numpy as np
import pytest

from comic_tpu.data.synthetic import make_synthetic_dataset

pjoin = os.path.join

XE_STEPS = 1000
SCST_STEPS = 20


@pytest.mark.slow
class TestOverfitGate:
    @pytest.fixture(scope="class")
    def env(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("overfit")
        root, _ = make_synthetic_dataset(
            str(tmp / "data"), num_train=10, num_valid=4, num_test=4,
            captions_per_image=1, test_mirrors_train=True,
            distinct_images=True)
        return root, str(tmp / "exp")

    def _config(self, root, log_path, **over):
        from comic_tpu.configuration import Config

        kw = dict(
            token_type="word", dataset_dir=root,
            dataset_file_pattern="synth_{}", batch_size_train=5,
            batch_size_eval=4, max_epoch=10_000, rnn_size=64,
            rnn_word_size=32, attn_num_heads=2, compute_dtype="float32",
            cnn_input_size=(64, 64), lr_start=3e-3, lr_end=1e-4,
            # sane epsilon for a 1000-step memorization run: the default
            # 1e-2 reproduces tf.train.AdamOptimizer's eps-dominated
            # regime (optimizer.scale_by_tf1_adam), where effective steps
            # are ~eps-limited and convergence needs many epochs like the
            # reference's real runs — too slow for this gate
            adam_epsilon=1e-6,
            dropout_rnn_in=0.0, dropout_rnn_out=0.0, attn_keep_prob=1.0,
            log_path=log_path, num_logs_per_epoch=1, rand_seed=0,
            # single-device: batch 5 over the virtual 5-device mesh pays
            # a per-step CPU collective that triples wall time; DP
            # equivalence is test_parallel.py's job, not this gate's
            num_data_shards=1)
        kw.update(over)
        return Config(**kw)

    def _infer_scores(self, root, exp_dir, ckpt_step):
        from comic_tpu.cli.infer import main as infer_main

        results = infer_main([
            "--infer_checkpoints_dir", exp_dir,
            "--infer_checkpoints", str(ckpt_step),
            "--dataset_dir", root,
            "--annotations_file",
            pjoin(root, "captions", "annotations_test.json"),
            "--infer_set", "test",
            "--batch_size_infer", "5",
            "--infer_beam_size", "3",
            "--infer_max_length", "20",
        ])
        assert len(results) == 1, results
        return next(iter(results.values()))

    def test_xe_memorizes_to_high_cider(self, env):
        from comic_tpu.training.xe import train_fn

        root, log_root = env
        exp = pjoin(log_root, "xe")
        c = self._config(root, exp)
        metrics = train_fn(c, max_steps_override=XE_STEPS)

        # learning-dynamics gate: teacher-forced train ppl near 1
        assert np.isfinite(metrics["total_loss"])
        assert metrics["log_ppl"] < 0.6, metrics  # measured 0.29 @ 1000

        # quality gate through the real restore+decode+score chain
        scores = self._infer_scores(root, exp, XE_STEPS)
        # measured 8.08 CIDEr / 0.868 Bleu_4 at 1000 steps; ceiling ~10.
        # 5.0 leaves room for seed/platform jitter while still being
        # unreachable without genuine image->caption memorization (the
        # LM-floor run measures ~0.2).
        assert scores["CIDEr"] > 5.0, scores
        assert scores["Bleu_4"] > 0.5, scores

    def test_scst_keeps_reward_and_quality(self, env):
        from comic_tpu.training.scst import train_fn_scst

        root, log_root = env
        xe_dir = pjoin(log_root, "xe")
        assert os.path.isdir(xe_dir), "runs after the XE gate (same class)"
        scst_dir = pjoin(log_root, "scst")
        c = self._config(
            root, scst_dir, checkpoint_path=xe_dir,
            lr_start=2e-5, lr_end=2e-5, scst_beam_size=3,
            batch_size_train=5)
        metrics = train_fn_scst(c, max_steps_override=SCST_STEPS)

        # the reward the policy gradient optimizes must be finite and,
        # on a memorized model, near zero (samples can't beat a perfect
        # greedy baseline by much, nor trail it catastrophically)
        assert np.isfinite(metrics["reward"]), metrics
        assert abs(metrics["reward"]) < 5.0, metrics
        assert np.isfinite(metrics["scst_loss"]), metrics

        # SCST must not destroy the memorized captions (non-degradation
        # half of the gate; genuine improvement is unmeasurable this
        # close to the ceiling)
        scores = self._infer_scores(root, scst_dir, SCST_STEPS)
        assert scores["CIDEr"] > 4.0, scores
