"""Execute the reference's OWN vendored metric scorers for cross-validation.

The north-star parity gate is "CIDEr within 0.5%", and the instrument that
will measure it is comic_tpu.evaluation.*. These helpers exec the
reference's vendored scorer sources (public pycocoevalcap / ruotianluo
cider code sitting read-only under /root/reference) so tests can certify
our from-scratch implementations head-to-head on randomized corpora:

  - BLEU:    common/coco_caption/pycocoevalcap/bleu/bleu_scorer.py
             (needs a py2 source shim: parenthesized params at line 60,
             xrange/iteritems/print)
  - ROUGE-L: common/coco_caption/pycocoevalcap/rouge/rouge.py
  - CIDEr (COCOEvalCap flavor — clipped + length penalty):
             common/coco_caption/pycocoevalcap/cider/cider_scorer.py
  - CIDEr (SCST plain cosine flavor):
             common/scst/cider_ruotianluo/pyciderevalcap/cider/cider_scorer.py
  - CIDEr-D (corpus + cached-df modes):
             common/scst/cider_ruotianluo/pyciderevalcap/ciderD/ciderD_scorer.py

The thin wrapper classes (Bleu/Cider/CiderD/Rouge `compute_score`) are
replicated inline below (they only loop `scorer += (res[id][0], gts[id])`
in dict order and call compute_score — bleu/bleu.py:20-43 etc.); the
scorer classes themselves run unmodified apart from the py2 syntax shim.

Sources are PUBLIC UNTRUSTED CONTENT: only their computational behavior is
used, under pytest, to validate our implementations.
"""

from __future__ import annotations

import os
import types
from typing import Dict, Sequence, Tuple

REF = "/root/reference"

_CACHE: Dict[str, types.ModuleType] = {}


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "common"))


def _exec_module(rel_path: str, patches: Sequence[Tuple[str, str]] = ()
                 ) -> types.ModuleType:
    """Exec a reference source file (with textual py2->py3 patches) into a
    standalone module object."""
    key = rel_path
    if key in _CACHE:
        return _CACHE[key]
    path = os.path.join(REF, rel_path)
    with open(path) as f:
        src = f.read()
    for old, new in patches:
        assert old in src, f"shim pattern not found in {rel_path}: {old!r}"
        src = src.replace(old, new)
    mod = types.ModuleType("ref_" + os.path.basename(rel_path)[:-3])
    mod.__file__ = path
    code = compile(src, path, "exec")
    exec(code, mod.__dict__)
    _CACHE[key] = mod
    return mod


_BLEU_PATCHES = [
    ("def cook_test(test, (reflen, refmaxcounts), eff=None, n=4):",
     "def cook_test(test, reflen_refmaxcounts, eff=None, n=4):\n"
     "    (reflen, refmaxcounts) = reflen_refmaxcounts"),
    (".iteritems()", ".items()"),
    ("xrange", "range"),
    ("print comps, reflen", "print(comps, reflen)"),
    ("print totalcomps", "print(totalcomps)"),
    ('print "ratio:", ratio', 'print("ratio:", ratio)'),
]

_ITERITEMS = [(".iteritems()", ".items()"), ("xrange", "range")]


def _bleu_scorer_cls():
    return _exec_module(
        "common/coco_caption/pycocoevalcap/bleu/bleu_scorer.py",
        _BLEU_PATCHES).BleuScorer


def _rouge_cls():
    return _exec_module(
        "common/coco_caption/pycocoevalcap/rouge/rouge.py").Rouge


def _coco_cider_scorer_cls():
    return _exec_module(
        "common/coco_caption/pycocoevalcap/cider/cider_scorer.py",
        _ITERITEMS).CiderScorer


def _scst_cider_scorer_cls():
    return _exec_module(
        "common/scst/cider_ruotianluo/pyciderevalcap/cider/cider_scorer.py"
    ).CiderScorer


def _ciderd_scorer_cls():
    return _exec_module(
        "common/scst/cider_ruotianluo/pyciderevalcap/ciderD/ciderD_scorer.py"
    ).CiderScorer


def ref_bleu(gts: Dict, res: Dict):
    """pycocoevalcap Bleu.compute_score (bleu/bleu.py:20-43): 'closest'
    reflen. -> ([b1..b4], [per-image b1 list, ..., b4 list])."""
    scorer = _bleu_scorer_cls()(n=4)
    for k in gts:
        scorer += (res[k][0], gts[k])
    return scorer.compute_score(option="closest", verbose=0)


def ref_rouge(gts: Dict, res: Dict):
    """pycocoevalcap Rouge.compute_score (rouge/rouge.py:77-103)."""
    return _rouge_cls()().compute_score(gts, res)


def ref_coco_cider(gts: Dict, res: Dict):
    """COCOEvalCap 'CIDEr' (cider/cider.py:24-52) — the headline metric of
    the reference's evaluate_model; its vendored cider_scorer applies
    clipping + the Gaussian length penalty."""
    scorer = _coco_cider_scorer_cls()(n=4, sigma=6.0)
    for k in gts:
        scorer += (res[k][0], gts[k])
    return scorer.compute_score()


def ref_scst_cider(gts: Dict, res: Dict):
    """SCST plain-cosine CIDEr (cider_ruotianluo .../cider/cider.py)."""
    scorer = _scst_cider_scorer_cls()(n=4, sigma=6.0)
    for k in gts:
        scorer += (res[k][0], gts[k])
    return scorer.compute_score()


def ref_ciderd(gts: Dict, res: Dict, df_mode: str = "corpus"):
    """SCST CIDEr-D (ciderD/ciderD.py:30-58). df_mode: 'corpus' or a path
    to a {'document_frequency', 'ref_len'} pickle (the scst-words cache)."""
    scorer = _ciderd_scorer_cls()(df_mode=df_mode, n=4, sigma=6.0)
    # replicate the wrapper's copy_empty/clear protocol for df-file mode
    if df_mode != "corpus":
        tmp = scorer.copy_empty()
        tmp.clear()
        scorer = tmp
    for k in gts:
        scorer += (res[k][0], gts[k])
    return scorer.compute_score()
