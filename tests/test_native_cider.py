"""Native C++ CIDEr-D scorer vs the pure-Python implementation."""

import numpy as np
import pytest

from comic_tpu.evaluation.cider import CiderD
from comic_tpu.evaluation.cider_native import make_ciderd, native_available
from comic_tpu.evaluation.ngrams import build_idf_cache

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def _case():
    gts = {
        0: ["a man riding a bike", "a person rides a bicycle"],
        1: ["a cat on a mat", "a kitten sitting on a rug"],
        2: ["a man riding a bike", "a person rides a bicycle"],  # same as 0
        3: ["a dog in the park", "a puppy playing outside"],
    }
    res = {
        0: ["a man riding a bike"],
        1: ["a cat sat"],
        2: ["riding a bike quickly today"],
        3: ["zzz qqq"],
    }
    return gts, res


class TestNativeMatchesPython:
    def test_corpus_mode(self):
        gts, res = _case()
        py_score, py_per = CiderD().compute_score(gts, res)
        nat = make_ciderd()
        assert nat.method() == "CIDEr-D"
        nat_score, nat_per = nat.compute_score(gts, res)
        np.testing.assert_allclose(nat_per, py_per, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(nat_score, py_score, rtol=1e-9)

    def test_cached_idf_mode(self):
        gts, res = _case()
        unique_refs = [gts[0], gts[1], gts[3]]
        cache = build_idf_cache(unique_refs)
        py_score, py_per = CiderD(df=cache).compute_score(gts, res)
        nat_score, nat_per = make_ciderd(df=cache).compute_score(gts, res)
        np.testing.assert_allclose(nat_per, py_per, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(nat_score, py_score, rtol=1e-9)

    def test_empty_hypothesis(self):
        gts = {0: ["a b c"], 1: ["d e f"]}
        res = {0: [""], 1: ["d e f"]}
        py = CiderD().compute_score(gts, res)[1]
        nat = make_ciderd().compute_score(gts, res)[1]
        np.testing.assert_allclose(nat, py, rtol=1e-9, atol=1e-12)

    def test_speed_sanity(self):
        # large-ish batch scores without error and fast
        import time

        gts = {i: [f"a man number {i % 7} riding a bike",
                   f"someone riding bicycle {i % 5}"] for i in range(400)}
        res = {i: [f"a man riding a bike {i % 3}"] for i in range(400)}
        nat = make_ciderd()
        t0 = time.time()
        for _ in range(5):
            nat.compute_score(gts, res)
        assert time.time() - t0 < 5.0
