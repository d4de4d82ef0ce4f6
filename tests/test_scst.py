"""SCST training tests: rollout shapes, reward plumbing, smoke train."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.configuration import Config
from comic_tpu.data.synthetic import make_synthetic_dataset
from comic_tpu.evaluation.scorers import CaptionScorer
from comic_tpu.models.captioner import build_model_spec, init_params
from comic_tpu.tokenization import Vocabulary
from comic_tpu.training.scst import (
    hypo_width,
    make_rollout,
    make_scst_train_step,
    score_and_encode,
    scst_decode_steps,
    train_fn_scst,
)
from comic_tpu.training.optimizer import build_optimizer
from comic_tpu.training.schedule import cosine_schedule
from comic_tpu.training.xe import TrainState


def _small_config(root):
    return Config(
        token_type="radix", radix_base=16, dataset_dir=root,
        dataset_file_pattern="synth_{}", batch_size_train=4,
        scst_beam_size=3, max_epoch=1, rnn_size=32, rnn_word_size=16,
        attn_num_heads=2, compute_dtype="float32", cnn_input_size=(64, 64),
        lr_start=1e-4, lr_end=1e-5, dropout_rnn_in=0.0, dropout_rnn_out=0.0,
        attn_keep_prob=1.0, freeze_scopes="encoder/cnn", rand_seed=0)


class TestScstUnits:
    def test_decode_steps_radix(self):
        wtoi = {"<PAD>": -1, "<UNK>": 0, "<GO>": 1, "<EOS>": 2}
        for i in range(290):
            wtoi[f"w{i}"] = i + 3
        v = Vocabulary(wtoi)  # ~294 entries, base 16 -> width 3
        c = Config(token_type="radix", radix_base=16)
        assert scst_decode_steps(c, v) == 60
        assert hypo_width(c, v) == 62

    def test_score_and_encode(self):
        wtoi = {"<PAD>": -1, "a": 0, "cat": 1, "sat": 2, "<UNK>": 3,
                "<GO>": 4, "<EOS>": 5}
        v = Vocabulary(wtoi)
        c = Config(token_type="word")
        scorer = CaptionScorer(None, {"ciderD": 1.0})
        refs = [["a cat sat"], ["a cat"]]
        # greedy ids: (2, T); beam ids: (2 beams, 2 batch, T)
        greedy = np.asarray([[0, 1, 5], [0, 5, -1]])
        beam = np.asarray([
            [[0, 1, 2, 5], [0, 1, 5, -1]],   # beam 0
            [[2, 2, 5, -1], [1, 5, -1, -1]],  # beam 1
        ])
        hypo_ids, rewards, m = score_and_encode(
            scorer, c, v, refs, greedy, beam, width=6)
        assert hypo_ids.shape == (4, 6)
        assert rewards.shape == (4,)
        # row 0 is "a cat sat" = exact ref -> highest reward in column 0
        assert rewards[0] > rewards[2]
        # encoded hypo row 0: GO a cat sat EOS pad
        np.testing.assert_array_equal(hypo_ids[0], [4, 0, 1, 2, 5, -1])

    def test_scores_keep_numeric_order_beyond_ten_images(self):
        """Regression: the joint gts/res dict is split back into
        greedy/sample blocks by NUMERIC key position; a lexicographic int
        sort (0,1,10,11,...,2,...) scrambles every reward once the dict
        holds >= 10 keys — i.e. at any real operating point (reference
        SCST: batch 10 x beam 7). Scores must be per-image identical to
        scoring each image alone (CIDEr-D with a fixed IDF cache is
        per-image independent)."""
        from comic_tpu.evaluation.ngrams import build_idf_cache

        words = [f"w{i}" for i in range(10)]
        b = 12
        refs = [[" ".join(words[(i + j) % 10] for j in range(5))]
                for i in range(b)]
        hypos = [" ".join(words[(i * 3 + j) % 10] for j in range(4))
                 for i in range(b)]
        greedy = [" ".join(words[(i + j) % 10] for j in range(3))
                  for i in range(b)]
        cache = build_idf_cache(refs)
        import pickle, tempfile
        with tempfile.NamedTemporaryFile(suffix=".p", delete=False) as f:
            pickle.dump(cache, f)
            path = f.name
        scorer = CaptionScorer(path, {"ciderD": 1.0})
        _, s_all, g_all = scorer.get_hypo_scores(
            refs, [[h] for h in hypos], [[g] for g in greedy])
        for i in range(b):
            _, s_one, g_one = scorer.get_hypo_scores(
                [refs[i]], [[hypos[i]]], [[greedy[i]]])
            np.testing.assert_allclose(s_all[i], s_one[0], rtol=1e-9,
                                       err_msg=f"sample score image {i}")
            np.testing.assert_allclose(g_all[i], g_one[0], rtol=1e-9,
                                       err_msg=f"greedy score image {i}")


class TestFinishStepPairing:
    def test_hypotheses_reach_train_step_image_major(self):
        """Regression: the scorer works beam-major (row k*B + i) but the
        train step repeats encoder outputs IMAGE-major (row i*K + k); the
        reorder in _finish_step must pair hypothesis (image i, beam k) with
        image i's encoder row."""
        from comic_tpu.training.scst import _finish_step

        wtoi = {"<PAD>": -1, "a": 0, "cat": 1, "sat": 2, "<UNK>": 3,
                "<GO>": 4, "<EOS>": 5}
        v = Vocabulary(wtoi)
        c = Config(token_type="word", scst_beam_size=2)
        scorer = CaptionScorer(None, {"ciderD": 1.0})
        refs = [["a cat sat"], ["a cat"]]
        greedy = np.asarray([[0, 1, 5], [0, 5, -1]])
        # beam-major decoded ids: beam k, image i
        beam = np.asarray([
            [[0, 1, 2, 5], [0, 1, 5, -1]],   # beam 0: im0="a cat sat", im1="a cat"
            [[2, 2, 5, -1], [1, 5, -1, -1]],  # beam 1: im0="sat sat",   im1="cat"
        ])
        captured = {}

        def fake_train_step(state, im_embed, fmaps, hypo_ids, rewards, rng):
            captured["hypo"] = np.asarray(hypo_ids)
            captured["rewards"] = np.asarray(rewards)
            return state, {"total_loss": jnp.float32(0)}

        pending = ((greedy, beam, jnp.zeros((2, 4)), jnp.zeros((2, 3, 4))),
                   refs)
        _finish_step(pending, None, fake_train_step, scorer, c, v, 6,
                     jax.random.PRNGKey(0), 0)
        hypo = captured["hypo"]
        # image-major: rows 0,1 are image 0's beams; rows 2,3 image 1's
        np.testing.assert_array_equal(hypo[0], [4, 0, 1, 2, 5, -1])  # im0 b0
        np.testing.assert_array_equal(hypo[1], [4, 2, 2, 5, -1, -1])  # im0 b1
        np.testing.assert_array_equal(hypo[2], [4, 0, 1, 5, -1, -1])  # im1 b0
        np.testing.assert_array_equal(hypo[3], [4, 1, 5, -1, -1, -1])  # im1 b1
        # im0 beam0 is the exact reference -> best reward among im0's rows
        assert captured["rewards"][0] > captured["rewards"][1]


@pytest.mark.slow
class TestScstEndToEnd:
    def test_rollout_and_train_step(self, tmp_path):
        root, vocab = make_synthetic_dataset(
            str(tmp_path / "d"), num_train=8, num_valid=4, num_test=4)
        c = _small_config(root)
        spec = build_model_spec(c, vocab)
        params = init_params(jax.random.PRNGKey(0), spec)
        rollout = make_rollout(spec, c, vocab)
        images = np.random.default_rng(0).integers(
            0, 256, (4, 256, 256, 3), dtype=np.uint8)
        g_ids, b_ids, im_embed, fmaps = rollout(
            params, jnp.asarray(images), jax.random.PRNGKey(1))
        steps = scst_decode_steps(c, vocab)
        assert g_ids.shape == (4, steps)
        assert b_ids.shape == (3, 4, steps)
        assert im_embed.shape == (4, 1024)

        optimizer, mask = build_optimizer(
            params, cosine_schedule(1e-4, 1e-5, 10),
            freeze_scopes=c.freeze_scopes)
        st = TrainState(params, optimizer.init(params),
                        jnp.asarray(0, jnp.int32))
        train_step = make_scst_train_step(spec, c, optimizer, mask)
        width = hypo_width(c, vocab)
        hypo = np.full((12, width), -1, np.int32)
        hypo[:, 0] = spec.decoder.start_id
        hypo[:, 1:5] = 3
        hypo[:, 5] = spec.decoder.end_id
        rewards = np.random.default_rng(1).normal(size=12).astype(np.float32)
        # snapshot before the step: train_step donates its input state
        conv_before = np.asarray(
            params["encoder"]["cnn"]["Conv2d_1a_7x7"]["weights"]).copy()
        st2, metrics = train_step(st, im_embed, fmaps, jnp.asarray(hypo),
                                  jnp.asarray(rewards), jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["total_loss"]))
        # frozen CNN unchanged
        np.testing.assert_allclose(
            np.asarray(st2.params["encoder"]["cnn"]["Conv2d_1a_7x7"]["weights"]),
            conv_before)

    def test_scst_driver_smoke(self, tmp_path):
        root, _ = make_synthetic_dataset(
            str(tmp_path / "d"), num_train=8, num_valid=4, num_test=4)
        c = _small_config(root)
        c.log_path = str(tmp_path / "exp")
        metrics = train_fn_scst(c, max_steps_override=3)
        assert "reward" in metrics
        assert np.isfinite(metrics["total_loss"])
        from comic_tpu.training.checkpoints import list_checkpoints
        ckpts = list_checkpoints(c.log_path)
        assert ckpts
        # overlapped mode (the default) must train EXACTLY max_step steps:
        # it used to dispatch one extra rollout on the final iteration and
        # train on it post-loop, saving model_compact-4 for max_step=3
        import os
        import re

        steps = [int(re.search(r"-(\d+)", os.path.basename(p)).group(1))
                 for p in ckpts]
        assert max(steps) == 3, ckpts
