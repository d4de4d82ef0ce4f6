"""Cross-validation of the metric stack against the reference's OWN scorers.

The parity gate ("CIDEr within 0.5% of the reference") is only as good as
the instrument measuring it. These tests exec the vendored scorer sources
under /root/reference (via reference_scorers.py) and assert our
from-scratch BLEU / ROUGE-L / CIDEr / CIDEr-D match them to double
precision — corpus scores AND per-image vectors — on:

  (a) randomized corpora (multiple seeds, int + string ids, empty and
      one-word captions included — they exercise the reference's
      bigram-count length quirk);
  (b) the reference's fakecap results fixture
      (common/coco_caption/results/captions_val2014_fakecap_results.json)
      with manufactured references;
  (c) the cached-IDF df mode through an on-disk cache pickle, certifying
      the artifact format is interchangeable with the reference's
      prepro_ngrams output;
  (d) the native C++ CIDEr-D, which transitively inherits the certificate.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from comic_tpu.evaluation.bleu import BleuScorer
from comic_tpu.evaluation.cider import Cider, CiderD
from comic_tpu.evaluation.cider_native import NativeCiderD, native_available
from comic_tpu.evaluation.ngrams import (build_idf_cache, load_idf_cache,
                                         save_idf_cache)
from comic_tpu.evaluation.rouge import RougeScorer

import reference_scorers as ref

pytestmark = pytest.mark.skipif(
    not ref.reference_available(), reason="reference sources not present")

FAKECAP = ("/root/reference/common/coco_caption/results/"
           "captions_val2014_fakecap_results.json")

TOL = dict(rtol=1e-10, atol=1e-12)


def _caption(rng: np.random.RandomState, vocab, min_len=0, max_len=18) -> str:
    n = int(rng.randint(min_len, max_len + 1))
    return " ".join(rng.choice(vocab, size=n)) if n else ""


def make_corpus(seed: int, n_images: int, string_ids: bool = False,
                allow_empty_hyp: bool = True):
    """(gts, res) dicts keyed in our scorers' id_sort_key order so the
    reference scorers (dict-iteration order) align per image."""
    rng = np.random.RandomState(seed)
    # small vocab -> heavy ngram overlap; a few multi-use function words
    vocab = np.array([f"w{i}" for i in range(20)] + ["a", "the", "on"])
    gts, res = {}, {}
    for i in range(n_images):
        key = f"im_{i:04d}" if string_ids else i
        n_refs = int(rng.randint(1, 6))
        refs = [_caption(rng, vocab, min_len=1) for _ in range(n_refs)]
        # sprinkle one-word refs (bigram-length quirk coverage)
        if rng.rand() < 0.2:
            refs[0] = str(rng.choice(vocab))
        hyp_min = 0 if allow_empty_hyp else 1
        if rng.rand() < 0.3:
            # near-miss hypothesis: perturbed copy of a reference
            words = refs[int(rng.randint(n_refs))].split()
            keep = [w for w in words if rng.rand() > 0.2]
            hyp = " ".join(keep)
            if not hyp and not allow_empty_hyp:
                hyp = str(rng.choice(vocab))
        else:
            hyp = _caption(rng, vocab, min_len=hyp_min)
        gts[key] = refs
        res[key] = [hyp]
    return gts, res


def _assert_bleu_matches(gts, res):
    r_score, r_per = ref.ref_bleu(gts, res)
    m_score, m_per = BleuScorer(4).compute_score(gts, res)
    np.testing.assert_allclose(m_score, r_score, **TOL)
    for k in range(4):
        np.testing.assert_allclose(m_per[k], r_per[k], **TOL)


def _assert_rouge_matches(gts, res):
    r_score, r_per = ref.ref_rouge(gts, res)
    m_score, m_per = RougeScorer().compute_score(gts, res)
    np.testing.assert_allclose(m_score, r_score, **TOL)
    np.testing.assert_allclose(m_per, r_per, **TOL)


def _assert_ciders_match(gts, res):
    # COCOEvalCap "CIDEr" (clipped + penalty) == our CiderD, corpus mode
    r_score, r_per = ref.ref_coco_cider(gts, res)
    m_score, m_per = CiderD().compute_score(gts, res)
    np.testing.assert_allclose(m_score, r_score, **TOL)
    np.testing.assert_allclose(m_per, r_per, **TOL)
    # SCST CIDEr-D, corpus mode (same formula, independent source)
    r_score, r_per = ref.ref_ciderd(gts, res)
    np.testing.assert_allclose(m_score, r_score, **TOL)
    np.testing.assert_allclose(m_per, r_per, **TOL)
    # SCST plain-cosine CIDEr == our Cider
    r_score, r_per = ref.ref_scst_cider(gts, res)
    m_score, m_per = Cider().compute_score(gts, res)
    np.testing.assert_allclose(m_score, r_score, **TOL)
    np.testing.assert_allclose(m_per, r_per, **TOL)
    # native C++ CIDEr-D inherits transitively
    if native_available():
        n_score, n_per = NativeCiderD().compute_score(gts, res)
        r_score, r_per = ref.ref_ciderd(gts, res)
        np.testing.assert_allclose(n_score, r_score, **TOL)
        np.testing.assert_allclose(n_per, r_per, **TOL)


class TestRandomizedCorpora:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_all_metrics_int_ids(self, seed):
        gts, res = make_corpus(seed, n_images=60)
        _assert_bleu_matches(gts, res)
        _assert_rouge_matches(gts, res)
        _assert_ciders_match(gts, res)

    @pytest.mark.parametrize("seed", [10, 11])
    def test_all_metrics_string_ids(self, seed):
        gts, res = make_corpus(seed, n_images=60, string_ids=True)
        _assert_bleu_matches(gts, res)
        _assert_rouge_matches(gts, res)
        _assert_ciders_match(gts, res)

    def test_degenerate_captions(self):
        # hand-built edge cases: empty hyp, one-word pairs, repeated words
        gts = {
            0: ["a"],                       # one-word ref
            1: ["a b", "b"],
            2: ["a a a a a", "a b c d e"],
            3: ["w1 w2 w3"],
            4: ["the the the"],
        }
        res = {
            0: [""],                        # empty hypothesis
            1: ["b"],                       # one-word hypothesis
            2: ["a a a a a"],
            3: ["w1 w2 w3"],
            4: ["the"],
        }
        _assert_bleu_matches(gts, res)
        _assert_rouge_matches(gts, res)
        _assert_ciders_match(gts, res)


class TestCachedDfMode:
    def test_idf_cache_pickle_interchangeable(self, tmp_path):
        # cache built from a training-style reference corpus
        train_gts, _ = make_corpus(100, n_images=80)
        cache = build_idf_cache([train_gts[k] for k in train_gts])
        path = str(tmp_path / "scst-words.p")
        save_idf_cache(path, cache)

        eval_gts, eval_res = make_corpus(101, n_images=50,
                                         allow_empty_hyp=True)
        r_score, r_per = ref.ref_ciderd(eval_gts, eval_res, df_mode=path)
        m_score, m_per = CiderD(
            df=load_idf_cache(path)).compute_score(eval_gts, eval_res)
        np.testing.assert_allclose(m_score, r_score, **TOL)
        np.testing.assert_allclose(m_per, r_per, **TOL)
        if native_available():
            n_score, n_per = NativeCiderD(
                df=load_idf_cache(path)).compute_score(eval_gts, eval_res)
            np.testing.assert_allclose(n_score, r_score, **TOL)
            np.testing.assert_allclose(n_per, r_per, **TOL)


class TestFakecapFixture:
    @pytest.mark.skipif(not os.path.exists(FAKECAP),
                        reason="fakecap fixture missing")
    def test_fakecap_hypotheses(self):
        with open(FAKECAP) as f:
            data = json.load(f)
        rng = np.random.RandomState(7)
        gts, res = {}, {}
        for entry in data[:300]:
            key = int(entry["image_id"])
            if key in res:
                continue
            # whitespace-normalize (the PTB tokenizer's job in the real
            # pipeline; reference rouge splits on literal ' ')
            hyp = " ".join(str(entry["caption"]).split()).lower()
            words = hyp.split()
            refs = [hyp]  # one exact match
            for _ in range(int(rng.randint(1, 4))):
                keep = [w for w in words if rng.rand() > 0.3]
                refs.append(" ".join(keep) if keep else "a")
            gts[key], res[key] = refs, [hyp]
        gts = {k: gts[k] for k in sorted(gts)}
        res = {k: res[k] for k in sorted(res)}
        assert len(gts) > 200
        _assert_bleu_matches(gts, res)
        _assert_rouge_matches(gts, res)
        _assert_ciders_match(gts, res)
