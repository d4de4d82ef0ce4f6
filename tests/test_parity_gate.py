"""Dress rehearsal of tools/parity_gate.py (the STATUS.md playbook as one
command): the gate must PASS on a reference-style experiment dir whose
checkpoint reproduces the annotated captions, FAIL on a wrong-weights
dir scored against the SAME annotations/target, and REFUSE to score
through the Python PTB fallback unless explicitly allowed.

Self-consistency trick (no real data can enter this image): generate
captions with manufactured "reference" weights first, then write the
annotation JSON FROM those captions — the right-weights dir reproduces
its own references (high CIDEr), while a different-seed wrong-weights
dir decodes different captions against them (low CIDEr). The weights
are PROPERLY INITIALIZED (init_params with a seed), not N(0,1) noise:
saturated random weights decode one constant caption for every image,
and a constant caption corpus has df == N for every ngram, zeroing all
IDF weights — CIDEr is 0 even on exact self-match (measured while
building this test; BLEU was 1.0). Distinct solid-colour images +
init-scale weights give per-image-distinct captions, which is what
makes the CIDEr gate informative. This exercises
the whole chain the real parity run will use: config.pkl ingestion ->
TF model_compact conversion -> beam-search sweep -> COCO scoring ->
threshold verdict + exit code.
"""

import json
import os
import sys

import numpy as np
import pytest

import test_reference_ckpt as refckpt
from comic_tpu.configuration import Config
from comic_tpu.data import captions as cap_io
from comic_tpu.data.synthetic import make_synthetic_dataset
from comic_tpu.models.captioner import build_model_spec, init_params
from comic_tpu.tokenization import Vocabulary

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from tools import parity_gate  # noqa: E402

pjoin = os.path.join

import jax  # noqa: E402


def _make_reference_dir(tmp_path, root, name, seed):
    """Reference-style experiment dir: config.pkl + ONE TF model_compact
    checkpoint manufactured from seed-specific weights (no msgpack)."""
    config = Config(
        token_type="radix", radix_base=32, dataset_dir=root,
        dataset_file_pattern="synth_{}", rnn_size=64, rnn_word_size=16,
        attn_num_heads=4, compute_dtype="float32", cnn_input_size=(64, 64),
        log_path=str(tmp_path / name), batch_size_infer=2,
        infer_beam_size=2, infer_max_length=8, infer_set="test")
    vv = cap_io.load_vocab(root, "synth_{}")
    config.wtoi = vv.wtoi
    config.itow = {str(k): w for k, w in vv.itow.items()}
    config.vocab_size = len(vv.itow)
    os.makedirs(config.log_path, exist_ok=True)
    config.save(config.log_path)

    vocab = Vocabulary.from_str_itow(config.wtoi, config.itow)
    spec = build_model_spec(config, vocab)
    template = init_params(jax.random.PRNGKey(1), spec)
    # init-scale weights, NOT noise — see module docstring
    source = init_params(jax.random.PRNGKey(seed), spec)
    tf_vars = refckpt._flatten(source["encoder"]["cnn"],
                               "Model/encoder/cnn/InceptionV1")
    names = refckpt._reference_var_names(config, template["decoder"])
    for p, leaf in refckpt._flat_paths(source["decoder"]):
        tf_vars[names[p]] = np.asarray(leaf)
    refckpt._write_tf1_checkpoint(config.log_path, tf_vars, step=50)
    return config


def _read_captions(log_path):
    infer_dir = [d for d in os.listdir(log_path)
                 if d.startswith("infer_")][0]
    path = pjoin(log_path, infer_dir, "captions___model_compact-50.json")
    with open(path) as f:
        return {c["image_id"]: c["caption"] for c in json.load(f)}


@pytest.mark.slow
class TestParityGate:
    @pytest.fixture(scope="class")
    def env(self, tmp_path_factory):
        from comic_tpu.inference import sweep_checkpoints

        tmp = tmp_path_factory.mktemp("pgate")
        root, _ = make_synthetic_dataset(
            str(tmp / "d"), num_train=4, num_valid=2, num_test=6,
            captions_per_image=1, distinct_images=True)
        right = _make_reference_dir(tmp, root, "right_exp", seed=3)

        # decode the "reference" captions, then write annotations FROM
        # them so the right weights reproduce their own references
        sweep_checkpoints(right, get_metric_score=False)
        caps = _read_captions(right.log_path)
        assert any(c.strip() for c in caps.values()), caps
        # the CIDEr gate is informative only when captions differ across
        # images (df < N keeps IDF nonzero — see module docstring)
        assert len(set(caps.values())) >= 3, caps
        ann_file = str(tmp / "annotations_ref.json")
        with open(ann_file, "w") as f:
            json.dump({"annotations": [
                {"image_id": k, "caption": c or "a", "id": i}
                for i, (k, c) in enumerate(caps.items())]}, f)

        # the score the right weights actually achieve = the gate target
        from comic_tpu.evaluation.coco_eval import evaluate_captions

        infer_dir = [d for d in os.listdir(right.log_path)
                     if d.startswith("infer_")][0]
        res_json = pjoin(right.log_path, infer_dir,
                         "captions___model_compact-50.json")
        target, _ = evaluate_captions(ann_file, res_json)
        assert target["CIDEr"] > 1.0, target  # self-match must score high
        return tmp, root, right, ann_file, float(target["CIDEr"]), caps

    def _argv(self, exp_dir, root, ann_file, target):
        return [
            "--experiment_dir", exp_dir,
            "--dataset_dir", root,
            "--annotations_file", ann_file,
            "--target_cider", repr(target),
            "--infer_set", "test",
            "--batch_size_infer", "2",
            "--infer_beam_size", "2",
            "--infer_max_length", "8",
        ]

    def test_gate_passes_on_right_weights(self, env, capsys):
        tmp, root, right, ann_file, target, _ = env
        rc = parity_gate.main(
            self._argv(right.log_path, root, ann_file, target)
            + ["--allow_ptb_fallback"])
        assert rc == 0
        verdict = json.loads(capsys.readouterr().out.splitlines()[-2])
        assert verdict["passed"] is True
        assert verdict["best_checkpoint"] == "model_compact-50"
        assert verdict["best_cider"] >= target * 0.995
        assert verdict["tokenizer"] == "python_fallback_allowed"

    def test_gate_fails_on_wrong_weights(self, env, capsys):
        tmp, root, right, ann_file, target, right_caps = env
        wrong = _make_reference_dir(tmp, root, "wrong_exp", seed=99)
        rc = parity_gate.main(
            self._argv(wrong.log_path, root, ann_file, target)
            + ["--allow_ptb_fallback"])
        assert rc == 1
        verdict = json.loads(capsys.readouterr().out.splitlines()[-2])
        assert verdict["passed"] is False
        assert verdict["best_cider"] < target * 0.995
        # the FAIL is meaningful only if the wrong weights actually
        # decoded different captions
        assert _read_captions(wrong.log_path) != right_caps

    def test_gate_refuses_fallback_tokenizer_by_default(self, env):
        tmp, root, right, ann_file, target, _ = env
        with pytest.raises(RuntimeError, match="PTB jar required"):
            parity_gate.main(
                self._argv(right.log_path, root, ann_file, target))
