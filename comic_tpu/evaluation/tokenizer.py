"""Caption tokenization for metric evaluation.

The reference shells out to Stanford CoreNLP's PTBTokenizer
(-preserveLines -lowerCase) and strips a fixed punctuation list
(/root/reference/common/coco_caption/pycocoevalcap/tokenizer/
ptbtokenizer.py:24-68). We keep the same interface:

  - `PTBTokenizer.tokenize({key: [{"caption": ...}]}) -> {key: [str]}`
  - the CoreNLP jar is used when Java + the jar are available;
  - otherwise a pure-Python approximation: lowercase, split punctuation
    off words, drop the same punctuation set. On typical COCO captions
    (clean lowercase prose) the two agree almost everywhere.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import tempfile
from typing import Dict, List

PUNCTUATIONS = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"]

_SPLIT = re.compile(r"[a-z0-9]+(?:'[a-z]+)?|[^\sa-z0-9]", re.IGNORECASE)

CORENLP_JAR = "stanford-corenlp-3.4.1.jar"


def _python_tokenize_line(line: str) -> str:
    toks = _SPLIT.findall(line.lower())
    return " ".join(t for t in toks if t not in PUNCTUATIONS)


def java_available(jar_dir: str = "") -> bool:
    if shutil.which("java") is None:
        return False
    return bool(jar_dir) and os.path.exists(os.path.join(jar_dir, CORENLP_JAR))


class PTBTokenizer:
    def __init__(self, jar_dir: str = ""):
        self.jar_dir = jar_dir

    def tokenize(self, captions_for_image: Dict[object, List[dict]]
                 ) -> Dict[object, List[str]]:
        keys = []
        lines = []
        for k, caps in captions_for_image.items():
            for c in caps:
                keys.append(k)
                lines.append(c["caption"].replace("\n", " "))

        if java_available(self.jar_dir):
            tokenized = self._java_tokenize(lines)
        else:
            tokenized = [_python_tokenize_line(l) for l in lines]

        out: Dict[object, List[str]] = {}
        for k, t in zip(keys, tokenized):
            out.setdefault(k, []).append(t)
        return out

    def _java_tokenize(self, lines: List[str]) -> List[str]:
        cmd = ["java", "-cp", os.path.join(self.jar_dir, CORENLP_JAR),
               "edu.stanford.nlp.process.PTBTokenizer",
               "-preserveLines", "-lowerCase"]
        with tempfile.NamedTemporaryFile("w", delete=False,
                                         suffix=".txt") as f:
            f.write("\n".join(lines))
            path = f.name
        try:
            with open(path) as fin:
                res = subprocess.run(cmd, stdin=fin, capture_output=True,
                                     text=True, check=True)
            out_lines = res.stdout.rstrip("\n").split("\n")
            return [" ".join(w for w in l.split()
                             if w not in PUNCTUATIONS) for l in out_lines]
        finally:
            os.unlink(path)


def tokenize_simple(caps: Dict[object, List[str]]) -> Dict[object, List[str]]:
    """Convenience: {key: [raw strings]} -> {key: [tokenized strings]}."""
    return {k: [_python_tokenize_line(c) for c in v] for k, v in caps.items()}
