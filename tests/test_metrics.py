"""Metric stack tests: BLEU/ROUGE-L/CIDEr/CIDEr-D goldens + SCST scorer."""

import math

import numpy as np
import pytest

from comic_tpu.evaluation import (
    BleuScorer,
    CaptionScorer,
    Cider,
    CiderD,
    build_idf_cache,
    save_idf_cache,
)
from comic_tpu.evaluation.rouge import lcs_length, rouge_l
from comic_tpu.evaluation.tokenizer import PTBTokenizer, _python_tokenize_line


class TestBleu:
    def test_perfect_match(self):
        gts = {0: ["a cat sat on the mat"]}
        res = {0: ["a cat sat on the mat"]}
        corpus, per = BleuScorer(4).compute_score(gts, res)
        np.testing.assert_allclose(corpus, [1.0] * 4, atol=1e-6)

    def test_unigram_precision_hand_case(self):
        # hyp: 4 tokens, 3 appear in ref (the the cat -> clipped)
        gts = {0: ["the cat sat"]}
        res = {0: ["the the cat dog"]}
        corpus, per = BleuScorer(1).compute_score(gts, res)
        # clipped matches: the(1) + cat(1) = 2 of 4; len 4 > 3 -> no BP
        np.testing.assert_allclose(corpus[0], 0.5, atol=1e-6)

    def test_brevity_penalty(self):
        gts = {0: ["a b c d e f"]}
        res = {0: ["a b c"]}
        corpus, _ = BleuScorer(1).compute_score(gts, res)
        # p1 = 1, ratio = 3/6 -> bp = exp(1 - 2)
        np.testing.assert_allclose(corpus[0], math.exp(-1.0), rtol=1e-5)

    def test_closest_reflen(self):
        # two refs of len 2 and 9; hyp len 3 -> closest is 2 -> no penalty
        gts = {0: ["a b", "a b c d e f g h i"]}
        res = {0: ["a b x"]}
        corpus, _ = BleuScorer(1).compute_score(gts, res)
        np.testing.assert_allclose(corpus[0], 2.0 / 3, rtol=1e-5)

    def test_corpus_pools_counts(self):
        gts = {0: ["a b"], 1: ["c d"]}
        res = {0: ["a b"], 1: ["x y"]}
        corpus, per = BleuScorer(1).compute_score(gts, res)
        np.testing.assert_allclose(corpus[0], 0.5, atol=1e-4)
        np.testing.assert_allclose(per[0][0], 1.0, atol=1e-4)
        np.testing.assert_allclose(per[0][1], 0.0, atol=1e-4)

    def test_bleu4_zero_when_no_4grams_match(self):
        gts = {0: ["a b c d"]}
        res = {0: ["a x c d"]}
        corpus, _ = BleuScorer(4).compute_score(gts, res)
        assert corpus[3] < 1e-3


class TestRouge:
    def test_lcs(self):
        assert lcs_length("a b c d".split(), "a c d".split()) == 3
        assert lcs_length([], ["a"]) == 0
        assert lcs_length("x y".split(), "a b".split()) == 0

    def test_perfect(self):
        score, per = rouge_l({0: ["a b c"]}, {0: ["a b c"]})
        np.testing.assert_allclose(score, 1.0)

    def test_hand_case(self):
        # hyp "a b d", ref "a b c d": lcs=3, P=1, R=3/4
        score, _ = rouge_l({0: ["a b c d"]}, {0: ["a b d"]})
        b2 = 1.2 ** 2
        p, r = 1.0, 0.75
        want = (1 + b2) * p * r / (r + b2 * p)
        np.testing.assert_allclose(score, want, rtol=1e-6)

    def test_max_over_refs(self):
        score, _ = rouge_l({0: ["x y z", "a b c"]}, {0: ["a b c"]})
        np.testing.assert_allclose(score, 1.0)


def _corpus():
    gts = {
        0: ["a man riding a bike", "a person rides a bicycle"],
        1: ["a cat on a mat", "a kitten sitting on a rug"],
        2: ["a dog in the park", "a puppy playing outside"],
    }
    return gts


class TestCider:
    def test_identical_hyp_scores_high(self):
        gts = _corpus()
        res = {0: ["a man riding a bike"], 1: ["a cat on a mat"],
               2: ["a dog in the park"]}
        score, per = Cider().compute_score(gts, res)
        assert score > 3.0  # each hyp matches one of its refs
        assert len(per) == 3

    def test_unrelated_hyp_scores_zero(self):
        gts = _corpus()
        res = {0: ["zzz qqq www"], 1: ["zzz qqq www"], 2: ["zzz qqq www"]}
        score, _ = Cider().compute_score(gts, res)
        np.testing.assert_allclose(score, 0.0, atol=1e-6)

    def test_ciderd_length_penalty(self):
        gts = _corpus()
        short = {0: ["a man riding a bike"], 1: ["a cat on a mat"],
                 2: ["a dog in the park"]}
        padded = {k: [v[0] + " x x x x x x x x"] for k, v in short.items()}
        s1, _ = CiderD().compute_score(gts, short)
        s2, _ = CiderD().compute_score(gts, padded)
        assert s2 < s1

    def test_cached_idf_mode(self, tmp_path):
        gts = _corpus()
        cache = build_idf_cache([gts[k] for k in gts])
        p = str(tmp_path / "idf.p")
        save_idf_cache(p, cache)
        from comic_tpu.evaluation.ngrams import load_idf_cache
        res = {0: ["a man riding a bike"], 1: ["a cat on a mat"],
               2: ["a dog in the park"]}
        s_corpus, per_corpus = CiderD().compute_score(gts, res)
        s_cached, per_cached = CiderD(
            df=load_idf_cache(p)).compute_score(gts, res)
        np.testing.assert_allclose(s_corpus, s_cached, rtol=1e-6)

    def test_legacy_log_ref_len_cache_migrated(self, tmp_path, capsys):
        # pre-r4 caches from THIS repo stored ref_len = log(N); the
        # current format (matching the reference artifact) stores raw N.
        # load_idf_cache must convert the legacy form loudly instead of
        # letting the scorer compute log(log(N)).
        import math
        import pickle

        from comic_tpu.evaluation.ngrams import load_idf_cache

        gts = _corpus()
        cache = build_idf_cache([gts[k] for k in gts])
        legacy = dict(cache)
        legacy["ref_len"] = math.log(float(cache["ref_len"]))
        p = str(tmp_path / "legacy_idf.p")
        with open(p, "wb") as f:
            pickle.dump(legacy, f)
        loaded = load_idf_cache(p)
        assert "legacy" in capsys.readouterr().out
        np.testing.assert_allclose(loaded["ref_len"], cache["ref_len"],
                                   rtol=1e-12)
        res = {0: ["a man riding a bike"], 1: ["a cat on a mat"],
               2: ["a dog in the park"]}
        s_raw, _ = CiderD(df=cache).compute_score(gts, res)
        s_legacy, _ = CiderD(df=loaded).compute_score(gts, res)
        np.testing.assert_allclose(s_legacy, s_raw, rtol=1e-9)

    def test_ciderd_clipping(self):
        # repeating a matching word should not inflate the score
        gts = {0: ["a a b c", "a b c d"], 1: ["x y z w", "x w z y"]}
        res_rep = {0: ["a a a a"], 1: ["x x x x"]}
        res_once = {0: ["a b c d"], 1: ["x y z w"]}
        s_rep, _ = CiderD().compute_score(gts, res_rep)
        s_once, _ = CiderD().compute_score(gts, res_once)
        assert s_once > s_rep


class TestTokenizer:
    def test_python_fallback(self):
        assert _python_tokenize_line("A man, riding; a bike!") == \
            "a man riding a bike"
        # PTB contraction splitting (CoreNLP: "don't" -> "do n't")
        assert _python_tokenize_line("Don't stop.") == "do n't stop"

    def test_tokenize_interface(self):
        tok = PTBTokenizer()
        out = tok.tokenize({5: [{"caption": "A Cat."}, {"caption": "Dogs!"}]})
        assert out == {5: ["a cat", "dogs"]}


class TestCaptionScorer:
    def _scorer(self):
        return CaptionScorer(None, {"ciderD": 1.0, "bleu": [0, 0, 0, 2]})

    def test_reward_shapes_beam_major(self):
        refs = [["a man riding a bike", "a person on a bicycle"],
                ["a cat on a mat", "a kitten on a rug"]]
        greedy = [["a man riding"], ["a cat sitting"]]
        # beam-major: [im0_b0, im1_b0, im0_b1, im1_b1]
        sample = [["a man riding a bike"], ["a cat on a mat"],
                  ["bad caption here"], ["another bad one"]]
        sc = self._scorer()
        hypos, sc_sample, sc_greedy = sc.get_hypo_scores(refs, sample, greedy)
        assert len(hypos) == 4
        assert sc_sample.shape == (4,) and sc_greedy.shape == (4,)
        # greedy tiled: first two equal last two
        np.testing.assert_allclose(sc_greedy[:2], sc_greedy[2:])
        # exact-match samples beat garbage samples
        assert sc_sample[0] > sc_sample[2]
        assert sc_sample[1] > sc_sample[3]

    def test_best_hypo_only(self):
        refs = [["a man riding a bike"]]
        greedy = [["a man"]]
        sample = [["junk words"], ["a man riding a bike"]]
        sc = self._scorer()
        hypos, sc_sample, sc_greedy = sc.get_hypo_scores(
            refs, sample, greedy, best_hypo_only=True)
        assert len(hypos) == 1
        assert hypos[0] == ["a man riding a bike"]
        assert sc_sample.shape == (1,) and sc_greedy.shape == (1,)

    def test_sample_multiple_mismatch_raises(self):
        sc = self._scorer()
        with pytest.raises(ValueError):
            sc.get_hypo_scores([["r"]], [["a"], ["b"], ["c"]], [["g"], ["h"]])


class TestStringImageIds:
    def test_insta_style_string_ids_evaluate(self, tmp_path):
        """Insta-style string image ids (insta_prepro annotation JSONs)
        must flow through annotation/result loading and scoring; COCO
        numeric ids keep coercing to int."""
        import json

        from comic_tpu.evaluation.coco_eval import (evaluate_captions,
                                                    load_annotations,
                                                    write_caption_json)

        ann = {"annotations": [
            {"image_id": "user1_@_post7", "caption": "a man on a bike"},
            {"image_id": "user1_@_post7", "caption": "a man rides"},
            {"image_id": "42", "caption": "a dog runs"},
        ]}
        ann_path = str(tmp_path / "ann.json")
        with open(ann_path, "w") as f:
            json.dump(ann, f)
        res_path = str(tmp_path / "res.json")
        write_caption_json(res_path, ["user1_@_post7", "42"],
                           ["a man on a bike", "a dog runs"])

        gts = load_annotations(ann_path)
        assert set(gts) == {"user1_@_post7", 42}  # numeric strings coerce
        scores, img_to_eval = evaluate_captions(ann_path, res_path)
        assert scores["Bleu_1"] > 0.9
        assert len(img_to_eval) == 2


class TestEvaluateGuards:
    def test_disjoint_id_sets_raise_not_zero(self):
        # a systematic id skew must fail loudly, not record 0.000 scores
        from comic_tpu.evaluation.coco_eval import CocoCaptionEvaluator

        ev = CocoCaptionEvaluator()
        with pytest.raises(ValueError, match="No result image id"):
            ev.evaluate({"img_007.jpg": [{"caption": "a dog"}]},
                        {7: [{"caption": "a dog"}]})

    def test_artifact_header_reemitted_on_metric_set_change(self, tmp_path):
        # appending rows with a different metric set (e.g. jars appearing)
        # must re-emit the header, never misalign columns
        from comic_tpu.evaluation.coco_eval import write_score_artifacts

        d = str(tmp_path)
        write_score_artifacts(d, "ckpt-1", {"Bleu_1": 0.5, "CIDEr": 0.9},
                              {})
        write_score_artifacts(d, "ckpt-2", {"Bleu_1": 0.6, "CIDEr": 1.0,
                                            "METEOR": 0.3}, {})
        lines = open(tmp_path / "metric_scores.txt").read().splitlines()
        headers = [l for l in lines if l.startswith("checkpoint")]
        assert len(headers) == 2 and "METEOR" in headers[1]
        # same metric set again: no third header
        write_score_artifacts(d, "ckpt-3", {"Bleu_1": 0.7, "CIDEr": 1.1,
                                            "METEOR": 0.4}, {})
        lines = open(tmp_path / "metric_scores.txt").read().splitlines()
        assert sum(l.startswith("checkpoint") for l in lines) == 2


def test_preprocess_rejects_upsampling_crop():
    # the reference pipeline crops from the fixed 256 host resize and
    # never upsamples (inception_preprocessing_radix.py:271); 299/331
    # cnn_input_size must fail loudly at trace time, not TypeError deep
    # in lax or silently zero-pad a dead border at eval
    import jax
    import jax.numpy as jnp

    from comic_tpu.data.preprocessing import preprocess_batch

    imgs = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    for training in (True, False):
        with pytest.raises(ValueError, match="crops, never upsamples"):
            preprocess_batch(imgs, jax.random.PRNGKey(0), 128, 128,
                             training)
