"""Inference driver + CLI tests on the synthetic dataset."""

import json
import os

import numpy as np
import pytest

from comic_tpu.configuration import Config, load_config
from comic_tpu.data.synthetic import make_synthetic_dataset
from comic_tpu.inference import (
    evaluate_model,
    image_id_from_path,
    infer_dir_name,
    run_inference,
    sweep_checkpoints,
)
from comic_tpu.training.xe import train_fn


def test_image_id_from_path():
    assert image_id_from_path("a/COCO_val2014_000000123456.jpg") == 123456
    assert image_id_from_path("insta/user_post.jpg") == "user_post"
    # '@' wins over digits (reference checks it FIRST, infer_fn.py:141):
    # an insta post name ending in digits must stay a string id
    assert image_id_from_path("im/user@post_123.jpg") == "user@post_123"
    # first '_'-prefixed digit run, not the trailing one (P_COCO findall[0])
    assert image_id_from_path("d/img_5_of_7.jpg") == 5


def test_infer_dir_name():
    c = Config(infer_set="test", infer_beam_size=3,
               infer_length_penalty_weight=0.0)
    assert infer_dir_name(c) == "infer_test_beam_3_lpen_0.0"


@pytest.mark.slow
class TestInferenceEndToEnd:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("inf")
        root, _ = make_synthetic_dataset(
            str(tmp / "d"), num_train=8, num_valid=4, num_test=4,
            captions_per_image=1)
        c = Config(
            token_type="radix", radix_base=16, dataset_dir=root,
            dataset_file_pattern="synth_{}", batch_size_train=4,
            batch_size_eval=4, max_epoch=1, rnn_size=32, rnn_word_size=16,
            attn_num_heads=2, compute_dtype="float32",
            cnn_input_size=(64, 64), dropout_rnn_in=0.0,
            dropout_rnn_out=0.0, attn_keep_prob=1.0,
            log_path=str(tmp / "exp"), freeze_scopes="", rand_seed=0,
            batch_size_infer=2, infer_beam_size=3, infer_max_length=10,
            infer_set="test")
        train_fn(c, max_steps_override=4)
        return c, root

    def test_run_inference_artifacts(self, trained):
        c, root = trained
        config = load_config(c.log_path)
        config.update(log_path=c.log_path, infer_set="test",
                      batch_size_infer=2, infer_beam_size=3,
                      infer_max_length=10)
        from comic_tpu.training.checkpoints import list_checkpoints
        name = list_checkpoints(c.log_path)[-1]
        save_dir, json_path = run_inference(
            config, os.path.join(c.log_path, name + ".msgpack"),
            save_attention=True)
        with open(json_path) as f:
            results = json.load(f)
        assert len(results) == 4
        assert {"image_id", "caption"} <= set(results[0])
        assert os.path.exists(os.path.join(save_dir, "infer_speed.txt"))
        pkls = [f for f in os.listdir(save_dir) if f.endswith(".pkl")]
        assert pkls
        # reference raw-outputs structure (infer_fn.py:107-151)
        import pickle
        with open(os.path.join(save_dir, pkls[0]), "rb") as fh:
            raw = pickle.load(fh)
        assert set(raw) == {"captions", "attention", "image_ids"}
        assert raw["attention"]  # default cap stores maps for 4 images
        f0 = next(iter(raw["attention"]))
        assert raw["attention"][f0].ndim == 3  # (heads, T, fm)
        assert raw["captions"] and raw["image_ids"]

    def test_run_inference_refuses_multiprocess(self, trained, monkeypatch):
        """Multi-process inference must refuse loudly: per-host numpy into
        a globally sharded serve jit is rejected by multi-process JAX, and
        cross-host output ids would not be host-addressable. Guidance: one
        single-process job per host (inference.py guard)."""
        import jax

        c, root = trained
        config = load_config(c.log_path)
        config.update(log_path=c.log_path, infer_set="test",
                      batch_size_infer=2, infer_beam_size=1,
                      infer_max_length=10)
        from comic_tpu.training.checkpoints import list_checkpoints
        name = list_checkpoints(c.log_path)[-1]
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        with pytest.raises(NotImplementedError, match="single-process"):
            run_inference(config,
                          os.path.join(c.log_path, name + ".msgpack"))

    def test_run_inference_closes_pipe_on_serve_build_error(
            self, trained, monkeypatch):
        """A failure while building the serve fn (e.g. a mesh
        divisibility ValueError) must still close the pipeline that
        run_inference itself constructed — the packed-h5 handle and
        prefetch worker must not leak on error paths, so serve-fn
        construction sits inside the close-owning try/finally."""
        import comic_tpu.inference as inf
        import comic_tpu.parallel.mesh as mesh_mod

        c, root = trained
        config = load_config(c.log_path)
        config.update(log_path=c.log_path, infer_set="test",
                      batch_size_infer=2, infer_beam_size=1,
                      infer_max_length=10)
        closed = []
        real_pipe = inf.InferencePipeline

        class SpyPipe(real_pipe):
            def close(self):
                closed.append(True)
                super().close()

        monkeypatch.setattr(inf, "InferencePipeline", SpyPipe)

        def boom(*a, **k):
            raise ValueError("injected mesh failure")

        monkeypatch.setattr(mesh_mod, "make_mesh_for_batch", boom)
        from comic_tpu.training.checkpoints import list_checkpoints
        name = list_checkpoints(c.log_path)[-1]
        with pytest.raises(ValueError, match="injected mesh failure"):
            run_inference(config,
                          os.path.join(c.log_path, name + ".msgpack"))
        assert closed, "owned pipeline was not closed on the error path"

    def test_sweep_with_scoring(self, trained):
        c, root = trained
        config = load_config(c.log_path)
        config.update(log_path=c.log_path, infer_set="test",
                      batch_size_infer=2, infer_beam_size=1,
                      infer_max_length=10)
        ann = os.path.join(root, "captions", "annotations_test.json")
        results = sweep_checkpoints(config, annotations_file=ann)
        assert results
        scores = next(iter(results.values()))
        assert {"Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"} <= set(scores)
        save_dir = os.path.join(c.log_path, infer_dir_name(config))
        assert os.path.exists(os.path.join(save_dir, "metric_scores.csv"))
        assert any(f.startswith("metric_scores_detailed")
                   for f in os.listdir(save_dir))

    def test_sweep_toggles_and_explicit_checkpoints(self, trained):
        """--infer_checkpoints list + run_inference/get_metric_score
        toggles (reference infer.py:37-50,99-102)."""
        c, root = trained
        config = load_config(c.log_path)
        config.update(log_path=c.log_path, infer_set="test",
                      batch_size_infer=2, infer_beam_size=1,
                      infer_max_length=10)
        from comic_tpu.training.checkpoints import list_checkpoints
        num = list_checkpoints(c.log_path)[-1].split("-")[-1]
        ann = os.path.join(root, "captions", "annotations_test.json")
        # scoring disabled -> inference runs but no scores returned
        out = sweep_checkpoints(config, annotations_file=ann,
                                checkpoints=num, get_metric_score=False)
        assert out == {}
        # inference disabled -> scores still computed from existing JSON
        out = sweep_checkpoints(config, annotations_file=ann,
                                checkpoints=num, run_infer=False)
        assert list(out) == [f"model_compact-{num}"]
        # unknown checkpoint number -> warn and continue, either mode
        out = sweep_checkpoints(config, annotations_file=ann,
                                checkpoints="999999", run_infer=False)
        assert out == {}
        out = sweep_checkpoints(config, annotations_file=ann,
                                checkpoints=f"999999,{num}")
        assert list(out) == [f"model_compact-{num}"]
        with pytest.raises(ValueError):
            sweep_checkpoints(config, checkpoints=",")


class TestCli:
    def test_train_cli_stage_resolution(self, tmp_path):
        from comic_tpu.cli.train import create_parser, experiment_name, resolve_stage

        args = create_parser().parse_args([
            "--dataset_dir", str(tmp_path), "--log_root", str(tmp_path),
            "--token_type", "radix", "--radix_base", "256"])
        name = experiment_name(args)
        assert name == "radix_b256_add_LN_softmax_h8_tie_lstm"
        extra = resolve_stage(args)
        assert extra["log_path"].endswith("radix_b256_add_LN_softmax_h8_tie_lstm_run_01")
        assert extra["stage_fn"].__name__ == "train_fn"

    def test_cnn_finetune_requires_decoder_dir(self, tmp_path):
        from comic_tpu.cli.train import create_parser, resolve_stage

        args = create_parser().parse_args([
            "--dataset_dir", str(tmp_path), "--log_root", str(tmp_path),
            "--train_mode", "cnn_finetune"])
        with pytest.raises(ValueError):
            resolve_stage(args)

    def test_scst_stage_overrides(self, tmp_path):
        import os
        from comic_tpu.cli.train import create_parser, resolve_stage

        # fabricate the decoder + cnnFT dirs the chain expects
        name = "radix_b256_add_LN_softmax_h8_tie_lstm"
        os.makedirs(tmp_path / f"{name}_run_01")
        os.makedirs(tmp_path / f"{name}_cnnFT_run_01")
        args = create_parser().parse_args([
            "--dataset_dir", str(tmp_path), "--log_root", str(tmp_path),
            "--train_mode", "scst"])
        extra = resolve_stage(args)
        assert args.batch_size_train == 10
        assert args.freeze_scopes == "encoder/cnn"
        assert args.scst_weight_bleu == [0.0, 0.0, 0.0, 2.0]
        assert "SCST_beam_7_CrD_1.0_B1_0.0_B4_2.0" in extra["log_path"]
        assert extra["stage_fn"].__name__ == "train_fn_scst"

    def test_try_to_train_writes_error_file(self, tmp_path):
        from comic_tpu.cli.train import try_to_train
        from comic_tpu.configuration import Config

        c = Config(log_path=str(tmp_path / "exp_x"))

        def boom(config):
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError):
            try_to_train(boom, c)
        err = tmp_path / "error__exp_x.txt"
        assert err.exists() and "boom" in err.read_text()


@pytest.mark.slow
class TestInstaStringIds:
    def test_string_id_inference_and_scoring(self, tmp_path):
        """InstaPIC-style runs carry string image ids (no trailing COCO
        number) from filenames through caption JSON to metric scoring
        (reference infer_fn.py:139-151 '@' branch)."""
        root, _ = make_synthetic_dataset(
            str(tmp_path / "d"), num_train=8, num_valid=4, num_test=4,
            captions_per_image=1, style="insta")
        c = Config(
            token_type="radix", radix_base=16, dataset_dir=root,
            dataset_file_pattern="synth_{}", batch_size_train=4,
            batch_size_eval=4, max_epoch=1, rnn_size=32, rnn_word_size=16,
            attn_num_heads=2, compute_dtype="float32",
            cnn_input_size=(64, 64), dropout_rnn_in=0.0,
            dropout_rnn_out=0.0, attn_keep_prob=1.0,
            log_path=str(tmp_path / "exp"), freeze_scopes="", rand_seed=0,
            batch_size_infer=2, infer_beam_size=2, infer_max_length=10,
            infer_set="test")
        train_fn(c, max_steps_override=2)
        config = load_config(c.log_path)
        config.update(log_path=c.log_path, infer_set="test",
                      batch_size_infer=2, infer_beam_size=2,
                      infer_max_length=10)
        ann = os.path.join(root, "captions", "annotations_test.json")
        results = sweep_checkpoints(config, annotations_file=ann)
        assert results
        scores = next(iter(results.values()))
        assert "CIDEr" in scores
        # the caption JSON carries the string ids verbatim
        save_dir = os.path.join(c.log_path, infer_dir_name(config))
        caps = [f for f in os.listdir(save_dir)
                if f.startswith("captions___")]
        with open(os.path.join(save_dir, caps[0])) as f:
            out = json.load(f)
        assert all(isinstance(r["image_id"], str)
                   and "user" in r["image_id"] for r in out)
