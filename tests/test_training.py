"""Training stack tests: schedules, optimizer masking, checkpoints, and an
end-to-end smoke train on the synthetic dataset (loss must go down)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.configuration import Config
from comic_tpu.data.synthetic import make_synthetic_dataset
from comic_tpu.training import checkpoints as ckpt
from comic_tpu.training.optimizer import (
    build_optimizer,
    masked_l2_loss,
    scope_mask,
    trainable_mask,
)
from comic_tpu.training.schedule import cosine_schedule, legacy_halving_schedule
from comic_tpu.training.xe import train_fn


class TestSchedules:
    def test_cosine_endpoints(self):
        f = cosine_schedule(1e-2, 1e-5, 100)
        np.testing.assert_allclose(float(f(jnp.asarray(0))), 1e-2, rtol=1e-5)
        np.testing.assert_allclose(float(f(jnp.asarray(100))), 1e-5, rtol=1e-4)
        np.testing.assert_allclose(float(f(jnp.asarray(200))), 1e-5, rtol=1e-4)
        mid = float(f(jnp.asarray(50)))
        np.testing.assert_allclose(mid, (1e-2 + 1e-5) / 2, rtol=1e-4)

    def test_legacy_halving(self):
        f = legacy_halving_schedule(1e-3, steps_per_epoch=10,
                                    reduce_every_n_epochs=4)
        np.testing.assert_allclose(float(f(jnp.asarray(0))), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(f(jnp.asarray(39))), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(f(jnp.asarray(40))), 5e-4, rtol=1e-5)
        np.testing.assert_allclose(float(f(jnp.asarray(80))), 2.5e-4, rtol=1e-5)


def _toy_params():
    return {
        "encoder": {"cnn": {"w": jnp.ones((2, 2))},
                    "head": {"w": jnp.ones((2,))}},
        "decoder": {"emb": jnp.ones((3,))},
    }


class TestOptimizer:
    def test_freeze_mask(self):
        p = _toy_params()
        m = trainable_mask(p, "Model/encoder/cnn")
        assert m["encoder"]["cnn"]["w"] is False
        assert m["encoder"]["head"]["w"] is True
        assert m["decoder"]["emb"] is True

    def test_no_freeze(self):
        m = trainable_mask(_toy_params(), "")
        assert all(jax.tree_util.tree_leaves(m))

    def test_frozen_params_not_updated(self):
        p = _toy_params()
        opt, mask = build_optimizer(
            p, lambda s: 0.1, freeze_scopes="encoder/cnn")
        st = opt.init(p)
        grads = jax.tree_util.tree_map(jnp.ones_like, p)
        updates, _ = opt.update(grads, st, p)
        assert float(jnp.abs(updates["encoder"]["cnn"]["w"]).max()) == 0.0
        assert float(jnp.abs(updates["decoder"]["emb"]).max()) > 0.0

    def test_grad_multiplier_scales_cnn(self):
        p = _toy_params()
        opt, _ = build_optimizer(p, lambda s: 1.0, optimiser="sgd",
                                 cnn_grad_multiplier=0.5)
        st = opt.init(p)
        grads = jax.tree_util.tree_map(jnp.ones_like, p)
        updates, _ = opt.update(grads, st, p)
        # sgd update = -lr * g; cnn grads halved
        np.testing.assert_allclose(updates["encoder"]["cnn"]["w"], -0.5)
        np.testing.assert_allclose(updates["decoder"]["emb"], -1.0)

    def test_masked_l2(self):
        p = _toy_params()
        mask = trainable_mask(p, "encoder/cnn")
        # trainable leaves: head (2 ones) + emb (3 ones) -> 5 * 0.5 * decay
        np.testing.assert_allclose(
            float(masked_l2_loss(p, mask, 0.1)), 0.25, rtol=1e-6)

    def test_scope_mask(self):
        m = scope_mask(_toy_params(), "encoder/cnn")
        assert m["encoder"]["cnn"]["w"] and not m["decoder"]["emb"]

    def test_frozen_cnn_step_skips_cnn_and_matches_decoder_grads(self):
        """With encoder/cnn frozen, the fused train step must leave the CNN
        bit-identical AND produce the same decoder update as an unfrozen
        run whose optimizer merely zeroes the CNN grads (the stop_gradient
        backward pruning must not change decoder gradients)."""
        from comic_tpu.configuration import Config
        from comic_tpu.models.captioner import build_model_spec, init_params
        from comic_tpu.tokenization import Vocabulary
        from comic_tpu.training.schedule import cosine_schedule
        from comic_tpu.training.xe import TrainState, make_train_step

        wtoi = {"<PAD>": -1, "w": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3}
        vocab = Vocabulary(wtoi)
        c = Config(token_type="radix", radix_base=8, rnn_size=16,
                   rnn_word_size=8, attn_num_heads=2,
                   compute_dtype="float32", cnn_input_size=(64, 64),
                   dropout_rnn_in=0.0, dropout_rnn_out=0.0,
                   attn_keep_prob=1.0, cnn_input_augment=False,
                   freeze_scopes="encoder/cnn")
        spec = build_model_spec(c, vocab)
        rng = np.random.default_rng(0)
        images = rng.integers(0, 256, (4, 256, 256, 3), dtype=np.uint8)
        caps = np.full((4, 6), -1, np.int32)
        caps[:, 0] = 8
        caps[:, 1:4] = rng.integers(0, 8, (4, 3))
        caps[:, 4] = 9

        results = []
        for scopes in ("encoder/cnn", ""):
            c.freeze_scopes = scopes
            params = init_params(jax.random.PRNGKey(0), spec)
            # in the unfrozen control, zero CNN updates via the multiplier
            opt, mask = build_optimizer(
                params, cosine_schedule(1e-3, 1e-4, 10),
                freeze_scopes=scopes,
                cnn_grad_multiplier=0.0 if not scopes else 1.0)
            state = TrainState(params, opt.init(params),
                               jnp.asarray(0, jnp.int32))
            step = make_train_step(spec, c, opt, mask, (64, 64))
            state, metrics = step(state, images, caps, jax.random.PRNGKey(7))
            results.append((
                float(metrics["log_ppl"]),
                np.asarray(state.params["decoder"]["embedding"]),
                np.asarray(
                    state.params["encoder"]["cnn"]["Conv2d_1a_7x7"]["weights"]),
            ))

        init_cnn = np.asarray(init_params(
            jax.random.PRNGKey(0), spec)["encoder"]["cnn"]["Conv2d_1a_7x7"]["weights"])
        # frozen run: CNN bit-identical to init
        np.testing.assert_array_equal(results[0][2], init_cnn)
        # same forward loss and same decoder update as the control
        np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
        np.testing.assert_allclose(results[0][1], results[1][1],
                                   rtol=1e-5, atol=1e-7)


class TestAsyncCheckpointer:
    def test_save_wait_load_roundtrip(self, tmp_path):
        from comic_tpu.training import checkpoints as ckpt

        params = {"decoder": {"w": jnp.arange(4.0)}}
        saver = ckpt.AsyncCheckpointer()
        for step in (1, 2, 3):
            saver.save(str(tmp_path), step, params, {"opt": jnp.zeros(2)},
                       max_saves=2)
        saver.close()
        names = ckpt.list_checkpoints(str(tmp_path))
        assert names == ["model_compact-2", "model_compact-3"]  # retention
        loaded = ckpt.load_compact(str(tmp_path), params)
        np.testing.assert_array_equal(loaded["decoder"]["w"],
                                      params["decoder"]["w"])
        fulls = ckpt.list_checkpoints(str(tmp_path), ckpt.FULL_PREFIX)
        assert fulls == ["model-2", "model-3"]

    def test_worker_error_surfaces(self, tmp_path):
        from comic_tpu.training import checkpoints as ckpt

        saver = ckpt.AsyncCheckpointer()
        # unwritable directory -> the worker fails; error surfaces on wait
        bad = tmp_path / "f"
        bad.write_text("not a dir")
        saver.save(str(bad), 1, {"w": jnp.zeros(1)})
        with pytest.raises(BaseException):
            saver.wait()
        # saver stays usable afterwards
        saver.save(str(tmp_path), 2, {"w": jnp.zeros(1)})
        saver.close()
        assert ckpt.list_checkpoints(str(tmp_path)) == ["model_compact-2"]


class TestMultiStep:
    def test_scan_of_k_matches_k_single_steps(self):
        """make_train_multi_step(K) must produce the exact same state as K
        sequential single steps fed the same batches and PRNG keys."""
        from comic_tpu.configuration import Config
        from comic_tpu.models.captioner import build_model_spec, init_params
        from comic_tpu.tokenization import Vocabulary
        from comic_tpu.training.schedule import cosine_schedule
        from comic_tpu.training.xe import (TrainState, make_train_multi_step,
                                           make_train_step)

        wtoi = {"<PAD>": -1, "w": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3}
        vocab = Vocabulary(wtoi)
        c = Config(token_type="radix", radix_base=8, rnn_size=16,
                   rnn_word_size=8, attn_num_heads=2,
                   compute_dtype="float32", cnn_input_size=(64, 64),
                   dropout_rnn_in=0.0, dropout_rnn_out=0.0,
                   attn_keep_prob=1.0, cnn_input_augment=False,
                   freeze_scopes="encoder/cnn")
        spec = build_model_spec(c, vocab)
        rng = np.random.default_rng(3)
        k = 3
        images = rng.integers(0, 256, (k, 2, 256, 256, 3), dtype=np.uint8)
        # MIXED bucket widths (6, 6, 9): the scan path must pad the stack
        # to 9 without changing either loss vs the single-step dispatches
        widths = [6, 6, 9]
        caps_list = []
        for i, wdt in enumerate(widths):
            cp = np.full((2, wdt), -1, np.int32)
            cp[:, 0] = 8
            cp[:, 1: wdt - 2] = rng.integers(0, 8, (2, wdt - 3))
            cp[:, wdt - 2] = 9
            caps_list.append(cp)
        keys = jax.random.split(jax.random.PRNGKey(11), k)

        def fresh_state():
            params = init_params(jax.random.PRNGKey(0), spec)
            opt, mask = build_optimizer(
                params, cosine_schedule(1e-3, 1e-4, 10),
                freeze_scopes=c.freeze_scopes)
            return (opt, mask,
                    TrainState(params, opt.init(params),
                               jnp.asarray(0, jnp.int32)))

        opt, mask, state = fresh_state()
        single = make_train_step(spec, c, opt, mask, (64, 64))
        map_losses = []
        for i in range(k):
            state, metrics_single = single(state, images[i], caps_list[i],
                                           keys[i])
            map_losses.append(float(metrics_single["map_loss"]))
        ref_emb = np.asarray(state.params["decoder"]["embedding"])

        opt, mask, state = fresh_state()
        multi = make_train_multi_step(spec, c, opt, mask, (64, 64), k)
        wmax = max(widths)
        caps_k = np.stack([
            np.pad(cp, ((0, 0), (0, wmax - cp.shape[1])),
                   constant_values=-1) for cp in caps_list])
        state, metrics_multi = multi(state, images, caps_k, keys,
                                     np.asarray(widths, np.int32))
        assert int(state.step) == k
        np.testing.assert_allclose(
            np.asarray(state.params["decoder"]["embedding"]), ref_emb,
            rtol=1e-6, atol=1e-8)
        # metrics are the last scanned step's, incl. the masked map loss
        np.testing.assert_allclose(float(metrics_multi["log_ppl"]),
                                   float(metrics_single["log_ppl"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(metrics_multi["map_loss"]),
                                   map_losses[-1], rtol=1e-5)


class TestOrbaxBackend:
    def test_save_load_resume_retention(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from comic_tpu.training import checkpoints as ckpt

        params = {"decoder": {"w": jnp.arange(4.0)},
                  "encoder": {"cnn": {"w": jnp.ones(3)}}}
        opt = {"mu": jnp.full((2,), 3.0)}
        saver = ckpt.make_saver("orbax")
        assert isinstance(saver, ckpt.OrbaxCheckpointer)
        d = str(tmp_path)
        for step in (1, 2, 3):
            saver.save(d, step, params, opt, max_saves=2)
        saver.close()
        # retention + shared naming contract with the msgpack backend
        assert ckpt.list_checkpoints(d) == ["model_compact-2",
                                            "model_compact-3"]
        assert ckpt.list_checkpoints(d, ckpt.FULL_PREFIX) == ["model-2",
                                                              "model-3"]
        # loaders dispatch on the on-disk artifact
        loaded = ckpt.load_compact(
            d, jax.tree_util.tree_map(jnp.zeros_like, params))
        np.testing.assert_array_equal(loaded["decoder"]["w"],
                                      np.arange(4.0))
        # the 3-way restore resumes from an orbax full checkpoint
        restored, opt2, step, mode = ckpt.restore_model(
            params, d, resume=True,
            opt_state=jax.tree_util.tree_map(jnp.zeros_like, opt))
        assert mode == "resume" and step == 3
        np.testing.assert_array_equal(opt2["mu"], np.full((2,), 3.0))

    def test_unknown_backend_raises(self):
        from comic_tpu.training import checkpoints as ckpt

        with pytest.raises(ValueError):
            ckpt.make_saver("sqlite")


class TestCheckpoints:
    def test_save_load_roundtrip(self, tmp_path):
        p = _toy_params()
        opt_state = {"mu": jnp.zeros((3,))}
        d = str(tmp_path)
        ckpt.save_checkpoint(d, 10, p, opt_state)
        names = ckpt.list_checkpoints(d)
        assert names == ["model_compact-10"]
        p2 = ckpt.load_compact(d, jax.tree_util.tree_map(jnp.zeros_like, p))
        np.testing.assert_allclose(p2["decoder"]["emb"], 1.0)
        st = ckpt.load_full(d, {"params": p, "step": np.int64(0),
                                "opt_state": opt_state})
        assert int(st["step"]) == 10

    def test_retention_and_natural_sort(self, tmp_path):
        p = _toy_params()
        d = str(tmp_path)
        for s in [2, 10, 1, 30, 9, 100]:
            ckpt.save_checkpoint(d, s, p, None, max_saves=3)
        names = ckpt.list_checkpoints(d)
        assert names == ["model_compact-10", "model_compact-30",
                         "model_compact-100"]
        fulls = ckpt.list_checkpoints(d, ckpt.FULL_PREFIX)
        assert fulls == ["model-30", "model-100"]

    def test_select_eval_checkpoints(self, tmp_path):
        p = _toy_params()
        d = str(tmp_path)
        for s in range(25):
            ckpt.save_checkpoint(d, s, p, None, max_saves=30)
        sel = ckpt.select_eval_checkpoints(d)
        assert len(sel) == 12 and sel[-1] == "model_compact-24"

    def test_masked_opt_state_roundtrip(self, tmp_path):
        """Frozen scopes wrap adam in optax.masked — the MaskedNode-bearing
        opt_state must survive the full-checkpoint msgpack roundtrip."""
        params = {"encoder": {"cnn": {"w": jnp.ones((4,))}},
                  "decoder": {"emb": jnp.full((3,), 2.0)}}
        opt, mask = build_optimizer(params, cosine_schedule(1e-3, 1e-4, 10),
                                    freeze_scopes="encoder/cnn")
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        st = opt.init(params)
        _, st = opt.update(grads, st, params)
        d = str(tmp_path)
        ckpt.save_checkpoint(d, 3, params, st)
        tpl = {"params": params, "step": np.int64(0),
               "opt_state": opt.init(params)}
        back = ckpt.load_full(d, tpl)
        assert int(back["step"]) == 3
        got = jax.tree_util.tree_leaves(back["opt_state"])
        want = jax.tree_util.tree_leaves(st)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w))

    def test_restore_with_excludes(self):
        old = _toy_params()
        new = jax.tree_util.tree_map(lambda x: x * 2, old)
        merged = ckpt.restore_with_excludes(old, new, "encoder/cnn")
        np.testing.assert_allclose(merged["encoder"]["cnn"]["w"], 1.0)
        np.testing.assert_allclose(merged["decoder"]["emb"], 2.0)

    def test_restore_modes(self, tmp_path):
        p = _toy_params()
        d = str(tmp_path)
        # scratch
        _, _, step, mode = ckpt.restore_model(p, None)
        assert mode == "scratch" and step == 0
        # full resume
        ckpt.save_checkpoint(d, 7, p, {"m": jnp.zeros(1)})
        _, _, step, mode = ckpt.restore_model(
            p, d, resume=True, opt_state={"m": jnp.zeros(1)})
        assert mode == "resume" and step == 7
        # model restore (not resume)
        _, _, step, mode = ckpt.restore_model(p, d)
        assert mode == "model" and step == 0
        # cnn-only restore
        cnn_path = os.path.join(d, "inception.msgpack")
        ckpt.save_cnn_checkpoint(
            cnn_path, {"w": jnp.full((2, 2), 5.0)})
        p2, _, _, mode = ckpt.restore_model(p, cnn_path)
        assert mode == "cnn"
        np.testing.assert_allclose(p2["encoder"]["cnn"]["w"], 5.0)


@pytest.mark.slow
class TestEndToEnd:
    def test_smoke_train_loss_decreases(self, tmp_path):
        root, _ = make_synthetic_dataset(
            str(tmp_path / "data"), num_train=8, num_valid=4, num_test=4,
            captions_per_image=1)
        c = Config(
            token_type="radix", radix_base=16, dataset_dir=root,
            dataset_file_pattern="synth_{}", batch_size_train=4,
            batch_size_eval=4, max_epoch=500, rnn_size=32, rnn_word_size=16,
            attn_num_heads=2, compute_dtype="float32",
            cnn_input_size=(128, 128), lr_start=3e-3, lr_end=1e-4,
            dropout_rnn_in=0.0, dropout_rnn_out=0.0, attn_keep_prob=1.0,
            log_path=str(tmp_path / "exp"), num_logs_per_epoch=1,
            freeze_scopes="", rand_seed=0)
        metrics = train_fn(c, max_steps_override=30)
        # loss after 30 steps on 8 repeated examples must beat uniform
        import math
        uniform = math.log(16 + 2)
        assert metrics["log_ppl"] < uniform, metrics
        # checkpoints + artifacts written
        from comic_tpu.training.checkpoints import list_checkpoints
        assert list_checkpoints(str(tmp_path / "exp"))
        assert os.path.exists(tmp_path / "exp" / "config.pkl")
        assert os.path.exists(tmp_path / "exp" / "model_size.txt")
        # reference ops.get_model_size format: INFO total + name/shape
        # stanzas (common/ops.py:62-91)
        txt = (tmp_path / "exp" / "model_size.txt").read_text()
        assert "INFO: Scope `decoder` contains" in txt
        assert "trainable parameters." in txt
        assert "decoder/embedding" in txt
        assert os.path.exists(tmp_path / "exp" / "events.jsonl")


@pytest.mark.slow
class TestEndToEndMultiStep:
    def test_smoke_train_steps_per_call(self, tmp_path):
        """Driver path for train_steps_per_call>1: odd max_step forces the
        scan calls AND the single-step tail; artifacts still land."""
        root, _ = make_synthetic_dataset(
            str(tmp_path / "data"), num_train=8, num_valid=4, num_test=4,
            captions_per_image=1)
        c = Config(
            token_type="radix", radix_base=16, dataset_dir=root,
            dataset_file_pattern="synth_{}", batch_size_train=4,
            batch_size_eval=4, max_epoch=500, rnn_size=32, rnn_word_size=16,
            attn_num_heads=2, compute_dtype="float32",
            cnn_input_size=(64, 64), lr_start=3e-3, lr_end=1e-4,
            dropout_rnn_in=0.0, dropout_rnn_out=0.0, attn_keep_prob=1.0,
            log_path=str(tmp_path / "exp"), num_logs_per_epoch=1,
            freeze_scopes="", rand_seed=0, train_steps_per_call=2)
        metrics = train_fn(c, max_steps_override=5)
        assert "log_ppl" in metrics
        from comic_tpu.training.checkpoints import (checkpoint_step,
                                                    list_checkpoints)
        names = list_checkpoints(str(tmp_path / "exp"))
        assert names and checkpoint_step(names[-1]) == 5


class TestBnMovingStatsFrozen:
    def test_moving_stats_never_trainable(self):
        params = {"encoder": {"cnn": {"conv": {
            "weights": jnp.ones((1, 1, 1, 2)),
            "BatchNorm": {"beta": jnp.zeros(2), "moving_mean": jnp.zeros(2),
                          "moving_variance": jnp.ones(2)}}}}}
        # even with nothing frozen (cnn_finetune), moving stats stay fixed
        m = trainable_mask(params, "")
        bn = m["encoder"]["cnn"]["conv"]["BatchNorm"]
        assert bn["beta"] is True
        assert bn["moving_mean"] is False and bn["moving_variance"] is False

        opt, mask = build_optimizer(params, lambda s: 1.0, optimiser="sgd",
                                    freeze_scopes="")
        st = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, st, params)
        upd_bn = updates["encoder"]["cnn"]["conv"]["BatchNorm"]
        assert float(jnp.abs(upd_bn["moving_mean"]).max()) == 0.0
        assert float(jnp.abs(upd_bn["moving_variance"]).max()) == 0.0
        assert float(jnp.abs(upd_bn["beta"]).max()) > 0.0


class TestInitialiserFlag:
    def test_he_changes_decoder_init(self):
        """--initialiser must reach decoder_init (was hardcoded xavier)."""
        from comic_tpu.configuration import Config
        from comic_tpu.models.captioner import build_model_spec, init_params
        from comic_tpu.tokenization import Vocabulary

        wtoi = {"<PAD>": -1, "w": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3}
        vocab = Vocabulary(wtoi)
        base = dict(token_type="radix", radix_base=8, rnn_size=16,
                    rnn_word_size=8, attn_num_heads=2,
                    cnn_input_size=(64, 64))
        p_x = init_params(jax.random.PRNGKey(0), build_model_spec(
            Config(**base, initialiser="xavier"), vocab))
        p_h = init_params(jax.random.PRNGKey(0), build_model_spec(
            Config(**base, initialiser="he"), vocab))
        a = np.asarray(p_x["decoder"]["embedding"])
        b = np.asarray(p_h["decoder"]["embedding"])
        assert not np.allclose(a, b)
        # he draws from a wider fan-in-only bound than glorot
        assert np.abs(b).max() > np.abs(a).max()


@pytest.mark.slow
class TestOrbaxDriverSmoke:
    def test_train_fn_with_orbax_backend(self, tmp_path):
        """checkpoint_backend='orbax' through the XE driver: orbax dirs
        written with the shared naming, and inference-style loading
        resolves them."""
        pytest.importorskip("orbax.checkpoint")
        root, _ = make_synthetic_dataset(
            str(tmp_path / "data"), num_train=8, num_valid=4, num_test=4,
            captions_per_image=1)
        c = Config(
            token_type="radix", radix_base=16, dataset_dir=root,
            dataset_file_pattern="synth_{}", batch_size_train=4,
            batch_size_eval=4, max_epoch=1, rnn_size=32, rnn_word_size=16,
            attn_num_heads=2, compute_dtype="float32",
            cnn_input_size=(64, 64), dropout_rnn_in=0.0,
            dropout_rnn_out=0.0, attn_keep_prob=1.0,
            log_path=str(tmp_path / "exp"), freeze_scopes="", rand_seed=0,
            checkpoint_backend="orbax")
        train_fn(c, max_steps_override=2)
        d = str(tmp_path / "exp")
        names = ckpt.list_checkpoints(d)
        assert names == ["model_compact-2"]
        assert os.path.isdir(os.path.join(d, "model_compact-2.orbax"))
        # resume path reads the orbax full checkpoint
        from comic_tpu.models.captioner import build_model_spec, init_params
        from comic_tpu.tokenization import Vocabulary
        vocab = Vocabulary.from_str_itow(c.wtoi, c.itow)
        spec = build_model_spec(c, vocab)
        tpl = init_params(jax.random.PRNGKey(0), spec)
        restored = ckpt.load_compact(d, tpl)
        leaves = jax.tree_util.tree_leaves(restored)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


class TestStepTracer:
    def test_window_start_stop(self, monkeypatch):
        from comic_tpu.utils.profiling import StepTracer

        calls = []

        class _FakeProfiler:
            @staticmethod
            def start_trace(d):
                calls.append(("start", d))

            @staticmethod
            def stop_trace():
                calls.append(("stop", None))

        monkeypatch.setattr(jax, "profiler", _FakeProfiler)
        tr = StepTracer("/tmp/prof", start=2, count=2)
        for s in range(6):
            tr.step(s)
        tr.close()
        assert calls == [("start", "/tmp/prof"), ("stop", None)]

    def test_counts_calls_not_step_values(self, monkeypatch):
        """scan-of-K strides and resumed counters must still hit the
        window: the tracer counts invocations, not step values."""
        from comic_tpu.utils.profiling import StepTracer

        calls = []

        class _FakeProfiler:
            @staticmethod
            def start_trace(d):
                calls.append("start")

            @staticmethod
            def stop_trace():
                calls.append("stop")

        monkeypatch.setattr(jax, "profiler", _FakeProfiler)
        tr = StepTracer("/tmp/prof", start=2, count=2)
        for s in range(1000, 1048, 8):  # resumed run, K=8 stride
            tr.step(s)
        tr.close()
        assert calls == ["start", "stop"]

    def test_noop_without_dir(self):
        from comic_tpu.utils.profiling import StepTracer

        tr = StepTracer(None)
        for s in range(5):
            tr.step(s)
        tr.close()  # nothing raised, nothing traced
