"""Dataset prep + checkpoint converter tests."""

import json
import os
import pickle

import numpy as np
import pytest

from comic_tpu.prepro import base as prep
from comic_tpu.prepro.insta import tokenize as insta_tokenize
from comic_tpu.prepro.ngrams import build_from_caption_file


def _karpathy_json(tmp_path):
    imgs = []
    sent = lambda toks: {"tokens": toks, "raw": " ".join(toks)}
    imgs.append({"filepath": "train2014", "filename": "COCO_train2014_000000000001.jpg",
                 "split": "train", "cocoid": 1,
                 "sentences": [sent(["a", "cat", "sat"]),
                               sent(["a", "Cat!", "on", "mat"])]})
    imgs.append({"filepath": "val2014", "filename": "COCO_val2014_000000000002.jpg",
                 "split": "restval", "cocoid": 2,
                 "sentences": [sent(["a", "dog"])]})
    imgs.append({"filepath": "val2014", "filename": "COCO_val2014_000000000003.jpg",
                 "split": "val", "cocoid": 3,
                 "sentences": [sent(["a", "bird", "flies"])]})
    imgs.append({"filepath": "val2014", "filename": "COCO_val2014_000000000004.jpg",
                 "split": "test", "cocoid": 4,
                 "sentences": [sent(["a", "fish"])]})
    p = tmp_path / "dataset_coco.json"
    with open(p, "w") as f:
        json.dump({"images": imgs}, f)
    return str(p)


class TestPreproBase:
    def test_clean_tokens(self):
        assert prep.clean_tokens(["A", "Cat!", "", "42nd"]) == ["a", "cat", "42nd"]

    def test_pipeline_artifacts(self, tmp_path):
        ds = prep.tokenise_karpathy(_karpathy_json(tmp_path))
        out = str(tmp_path / "captions")
        prefix = "mscoco_{}_w1_s20_include_restval"
        counts = prep.write_caption_txts(ds, out, prefix,
                                         caption_len_thres=20)
        # restval folded into train
        assert counts == {"train": 3, "valid": 1, "test": 1}
        with open(os.path.join(out, prefix.format("train") + ".txt")) as f:
            lines = f.read().strip().split("\n")
        assert lines[0].startswith("train2014/COCO_train2014")
        assert ",<GO> a cat sat <EOS>" in lines[0]

        vocab = prep.write_vocab(ds, out, prefix, word_count_thres=1)
        assert vocab.wtoi["a"] == 0  # most frequent
        assert os.path.exists(os.path.join(out, prefix.format("wtoi") + ".json"))

        prep.write_filename_lists(ds, out)
        with open(os.path.join(out, "filenames_test.txt")) as f:
            assert "COCO_val2014_000000000004" in f.read()

        prep.write_annotation_jsons(ds, out)
        with open(os.path.join(out, "annotations_valid.json")) as f:
            anns = json.load(f)["annotations"]
        assert anns[0]["image_id"] == 3

    def test_truncation(self, tmp_path):
        ds = [prep.TokenisedImage(
            filepath="x.jpg", split="train", image_id=0,
            tokens=[["w"] * 30])]
        out = str(tmp_path)
        prep.write_caption_txts(ds, out, "p_{}", caption_len_thres=5)
        with open(os.path.join(out, "p_train.txt")) as f:
            line = f.read().strip()
        assert line.count(" w") == 5


class TestTxtV2AndPacked:
    def _dataset(self):
        from comic_tpu.prepro.base import TokenisedImage

        return [
            TokenisedImage(filepath="a.png", split="train", image_id=1,
                           tokens=[["w"] * 25, ["a", "cat"]]),
            TokenisedImage(filepath="b.png", split="val", image_id=2,
                           tokens=[["a", "dog"]]),
            TokenisedImage(filepath="c.png", split="test", image_id=3,
                           tokens=[["a", "bird"]]),
        ]

    def test_txt_v2_truncates_after_wrap(self):
        """V2 wraps GO/EOS first, then truncates to thres+2 — long captions
        lose EOS (prepro_base.py:257-285)."""
        from comic_tpu.prepro.base import tokenised_word_to_txt_v2

        out = tokenised_word_to_txt_v2(self._dataset(), caption_len_thres=20)
        long_line = out["train"][0]
        toks = long_line.split(",")[1].split(" ")
        assert len(toks) == 22 and toks[0] == "<GO>" and toks[-1] == "w"
        short_line = out["train"][1]
        assert short_line == "a.png,<GO> a cat <EOS>"
        assert out["valid"] == ["b.png,<GO> a dog <EOS>"]

    def test_serialise_and_load_h5(self, tmp_path):
        pytest.importorskip("h5py")
        from comic_tpu.prepro.base import (
            load_h5_dataset,
            serialise_everything,
            tokenised_word_to_txt_v2,
        )

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        for name in ("a.png", "b.png", "c.png"):
            arr = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
            try:
                import cv2
                cv2.imwrite(str(img_dir / name), arr[:, :, ::-1])
            except ImportError:
                from PIL import Image
                Image.fromarray(arr).save(str(img_dir / name))
        txt = tokenised_word_to_txt_v2(self._dataset())
        wtoi = {"a": 0, "cat": 1}
        path = serialise_everything(
            str(tmp_path / "packed"), str(img_dir), (32, 32), 1, txt,
            wtoi, {0: "a", 1: "cat"})
        data = load_h5_dataset(path)
        assert data["wtoi"] == wtoi
        assert data["images"].shape == (3, 32, 32, 3)
        assert data["filenames_test"] == ["c.png"]
        # caption lines carry the image index into the packed array
        fidx, fp, _ = data["train"][1].split(",")
        assert fp == "a.png" and data["images"][int(fidx)].shape == (32, 32, 3)


class TestInstaTokenize:
    def test_username_collapse(self):
        toks = insta_tokenize("thanks @some.user_99 for the pic")
        assert "@username" in toks and "thanks" in toks

    def test_hashtag_split(self):
        toks = insta_tokenize("sunset#nofilter")
        assert "#nofilter" in toks

    def test_punctuation_removed(self):
        toks = insta_tokenize("wow!! amazing, right?")
        assert toks == ["wow", "amazing", "right"]

    def test_emoji_kept_as_escape(self):
        toks = insta_tokenize("nice day \U0001f600x")
        assert any(t.startswith("\\") for t in toks) or "nice" in toks


class TestNgramsCli:
    def test_idf_cache(self, tmp_path):
        cap_dir = tmp_path / "captions"
        cap_dir.mkdir()
        with open(cap_dir / "p_train.txt", "w") as f:
            f.write("img1.jpg,<GO> a cat <EOS>\n")
            f.write("img1.jpg,<GO> a dog <EOS>\n")
            f.write("img2.jpg,<GO> a bird <EOS>\n")
        out = build_from_caption_file(str(tmp_path), "p_{}")
        with open(out, "rb") as f:
            cache = pickle.load(f)
        df = cache["document_frequency"]
        assert df[("a",)] == 2.0  # two images
        assert df[("cat",)] == 1.0
        # raw image count on disk (reference prepro_ngrams.py:150 format)
        np.testing.assert_allclose(cache["ref_len"], 2.0)


class TestSlimConverter:
    def test_convert_roundtrip(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        import jax
        from comic_tpu.models import inception_v1 as iv1
        from comic_tpu.utils.tf_checkpoint import (
            convert_slim_checkpoint,
            slim_reader_to_tree,
            verify_tree_shapes,
        )

        template = iv1.init_params(jax.random.PRNGKey(0))

        # synthesize a slim-named checkpoint with the right shapes
        rng = np.random.default_rng(0)

        def flatten(tree, path=""):
            for k, v in tree.items():
                sub = f"{path}/{k}" if path else k
                if isinstance(v, dict):
                    yield from flatten(v, sub)
                else:
                    yield sub, np.asarray(v)

        tf1 = tf.compat.v1
        graph = tf1.Graph()
        with graph.as_default():
            for name, arr in flatten(template):
                tf1.get_variable("InceptionV1/" + name,
                                 initializer=rng.normal(
                                     size=arr.shape).astype(np.float32))
            saver = tf1.train.Saver()
            with tf1.Session(graph=graph) as sess:
                sess.run(tf1.global_variables_initializer())
                ckpt_path = str(tmp_path / "inception_v1.ckpt")
                saver.save(sess, ckpt_path)

        out = convert_slim_checkpoint(ckpt_path,
                                      str(tmp_path / "conv.msgpack"))
        assert os.path.exists(out)
        # load through the restore path and check a leaf matches
        from comic_tpu.training.checkpoints import restore_model
        params = {"encoder": {"cnn": template}, "decoder": {}}
        p2, _, _, mode = restore_model(params, out)
        assert mode == "cnn"
        reader = tf.train.load_checkpoint(ckpt_path)
        want = reader.get_tensor("InceptionV1/Conv2d_1a_7x7/weights")
        np.testing.assert_allclose(
            np.asarray(p2["encoder"]["cnn"]["Conv2d_1a_7x7"]["weights"]),
            want, rtol=1e-6)

    def test_shape_verification_catches_drift(self):
        from comic_tpu.utils.tf_checkpoint import verify_tree_shapes

        with pytest.raises(ValueError):
            verify_tree_shapes({"a": np.zeros((2, 2))},
                               {"a": np.zeros((3, 3))})
        with pytest.raises(KeyError):
            verify_tree_shapes({}, {"a": np.zeros((1,))})
