"""METEOR and SPICE via Java subprocesses (gated on jar availability).

The reference invokes meteor-1.5.jar over a stdin/stdout line protocol and
spice-1.0.jar over temp JSON files
(/root/reference/common/coco_caption/pycocoevalcap/meteor/meteor.py:15-80,
spice/spice.py:16-94). These metrics have no tractable pure-Python port
(METEOR needs its paraphrase tables, SPICE a scene-graph parser), so — like
the reference — they stay out-of-process and are skipped gracefully when
Java or the jars are absent. `available()` reports usability.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile
import threading
from typing import Dict, List, Optional, Tuple

METEOR_JAR = "meteor-1.5.jar"
SPICE_JAR = "spice-1.0.jar"


class MeteorScorer:
    """Line-protocol wrapper: EVAL ||| <stats per segment> -> scores."""

    def __init__(self, jar_dir: str = ""):
        self.jar_dir = jar_dir
        self._proc: Optional[subprocess.Popen] = None
        self._lock = threading.Lock()

    def available(self) -> bool:
        return (shutil.which("java") is not None
                and os.path.exists(os.path.join(self.jar_dir, METEOR_JAR)))

    def _ensure_proc(self):
        if self._proc is None:
            cmd = ["java", "-jar", "-Xmx2G",
                   os.path.join(self.jar_dir, METEOR_JAR),
                   "-", "-", "-stdio", "-l", "en", "-norm"]
            self._proc = subprocess.Popen(
                cmd, cwd=self.jar_dir, stdin=subprocess.PIPE,
                stdout=subprocess.PIPE, text=True, bufsize=1)

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        if not self.available():
            raise RuntimeError("METEOR jar/Java not available")
        with self._lock:
            self._ensure_proc()
            proc = self._proc
            eval_line = "EVAL"
            for key in gts:
                # the jar's field separator must not appear in the text
                # (meteor.py:53-54 sanitization)
                hypo = res[key][0].replace("|||", "").replace("  ", " ")
                refs = [r.replace("|||", "").replace("  ", " ")
                        for r in gts[key]]
                stat_line = " ||| ".join(("SCORE", " ||| ".join(refs), hypo))
                proc.stdin.write(stat_line + "\n")
                stats = proc.stdout.readline().strip()
                eval_line += " ||| " + stats
            proc.stdin.write(eval_line + "\n")
            scores = [float(proc.stdout.readline().strip()) for _ in gts]
            final = float(proc.stdout.readline().strip())
        return final, scores

    def method(self) -> str:
        return "METEOR"

    def close(self):
        if self._proc is not None:
            self._proc.kill()
            self._proc = None


class SpiceScorer:
    """Temp-JSON wrapper around spice-1.0.jar."""

    def __init__(self, jar_dir: str = ""):
        self.jar_dir = jar_dir

    def available(self) -> bool:
        return (shutil.which("java") is not None
                and os.path.exists(os.path.join(self.jar_dir, SPICE_JAR)))

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[dict]]:
        if not self.available():
            raise RuntimeError("SPICE jar/Java not available")
        input_data = [
            {"image_id": str(k), "test": res[k][0], "refs": gts[k]}
            for k in gts
        ]
        with tempfile.TemporaryDirectory() as tmp:
            in_path = os.path.join(tmp, "spice_in.json")
            out_path = os.path.join(tmp, "spice_out.json")
            with open(in_path, "w") as f:
                json.dump(input_data, f)
            cmd = ["java", "-jar", "-Xmx8G",
                   os.path.join(self.jar_dir, SPICE_JAR), in_path,
                   "-cache", os.path.join(tmp, "cache"),
                   "-out", out_path, "-subset", "-silent"]
            subprocess.run(cmd, cwd=self.jar_dir, check=True,
                           capture_output=True)
            with open(out_path) as f:
                results = json.load(f)
        by_id = {item["image_id"]: item["scores"] for item in results}
        scores = [by_id[str(k)] for k in gts]
        fs = [float(s["All"]["f"]) for s in scores]
        return sum(fs) / len(fs) if fs else 0.0, scores

    def method(self) -> str:
        return "SPICE"
