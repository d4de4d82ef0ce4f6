"""Full reference workflow through the CLIs on the synthetic fixture:

    train.py --train_mode decoder
    train.py --train_mode cnn_finetune     (restores from the decoder dir)
    train.py --train_mode scst             (restores from the cnnFT dir)
    infer.py --infer_checkpoints_dir <scst dir>

Mirrors src/train.py:233-270 stage chaining + src/infer.py end to end —
the integration surface none of the unit tests cross (flag plumbing,
config.pkl save/reload per stage, checkpoint hand-off between stages,
artifact layout).
"""

import json
import os

import pytest

from comic_tpu.data.synthetic import make_synthetic_dataset

pjoin = os.path.join


@pytest.mark.slow
class TestThreeStageChain:
    @pytest.fixture(scope="class")
    def env(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("chain")
        # num_train=10 so the SCST stage's forced batch 10 tiles exactly
        root, _ = make_synthetic_dataset(
            str(tmp / "data"), num_train=10, num_valid=4, num_test=4,
            captions_per_image=2)
        return root, str(tmp / "exp")

    def _argv(self, root, log_root):
        return [
            "--dataset_dir", root,
            "--dataset_file_pattern", "synth_{}",
            "--log_root", log_root,
            "--token_type", "radix", "--radix_base", "16",
            "--cnn_input_size", "64,64",
            "--rnn_size", "32", "--rnn_word_size", "16",
            "--attn_num_heads", "2",
            "--compute_dtype", "float32",
            "--batch_size_eval", "4",
            "--max_epoch", "1",
        ]

    def test_chain_and_infer(self, env):
        from comic_tpu.cli.infer import main as infer_main
        from comic_tpu.cli.train import main as train_main
        from comic_tpu.training.checkpoints import list_checkpoints

        root, log_root = env
        name = "radix_b16_add_LN_softmax_h2_tie_lstm"
        dec_dir = pjoin(log_root, f"{name}_run_01")
        ft_dir = pjoin(log_root, f"{name}_cnnFT_run_01")

        # stage 1: decoder (frozen CNN, random init, 2 steps)
        train_main(self._argv(root, log_root)
                   + ["--train_mode", "decoder", "--batch_size_train", "4"])
        assert list_checkpoints(dec_dir)
        assert os.path.exists(pjoin(dec_dir, "config.pkl"))
        assert os.path.exists(pjoin(dec_dir, "model_size.txt"))

        # stage 2: cnn_finetune (unfreezes, restores from the decoder dir;
        # resolve_stage forces lr 1e-3 / 10 epochs, train.py:241-250)
        train_main(self._argv(root, log_root)
                   + ["--train_mode", "cnn_finetune",
                      "--batch_size_train", "4"])
        assert list_checkpoints(ft_dir)

        # stage 3: SCST (batch forced to 10, beam 7, re-frozen CNN)
        train_main(self._argv(root, log_root) + ["--train_mode", "scst"])
        scst_dirs = [d for d in os.listdir(log_root) if "SCST" in d]
        assert scst_dirs, os.listdir(log_root)
        scst_dir = pjoin(log_root, scst_dirs[0])
        assert "SCST_beam_7_CrD_1.0_B1_0.0_B4_2.0" in scst_dir
        assert list_checkpoints(scst_dir)

        # inference + metrics over the SCST checkpoints via the infer CLI
        ann = pjoin(root, "captions", "annotations_test.json")
        results = infer_main([
            "--infer_checkpoints_dir", scst_dir,
            "--dataset_dir", root,
            "--annotations_file", ann,
            "--infer_set", "test",
            "--batch_size_infer", "2",
            "--infer_beam_size", "2",
            "--infer_max_length", "10",
        ])
        assert results
        scores = next(iter(results.values()))
        assert {"Bleu_1", "CIDEr", "ROUGE_L"} <= set(scores)
        infer_dir = pjoin(scst_dir, "infer_test_beam_2_lpen_0.0")
        caps = [f for f in os.listdir(infer_dir)
                if f.startswith("captions___")]
        assert caps
        with open(pjoin(infer_dir, caps[0])) as f:
            out = json.load(f)
        assert len(out) == 4 and {"image_id", "caption"} <= set(out[0])
        assert os.path.exists(pjoin(infer_dir, "infer_speed.txt"))
        assert os.path.exists(pjoin(infer_dir, "metric_scores.csv"))
