"""Protocol-level tests for the METEOR/SPICE Java wrappers.

No jars or Java exist in this environment, so a fake `java` executable on
PATH emulates each jar's stdio/JSON contract (meteor.py:15-80 line protocol,
spice.py:16-94 temp-JSON protocol). This exercises the wrapper logic —
line framing, ordering, ||| sanitization, JSON round trip — end to end.
"""

import json
import os
import stat
import sys

import numpy as np
import pytest

from comic_tpu.evaluation.java_metrics import (
    METEOR_JAR,
    SPICE_JAR,
    MeteorScorer,
    SpiceScorer,
)

_FAKE_METEOR = """#!{python}
import sys
# Emulates meteor-1.5.jar -stdio:
#   SCORE ||| ref1 ||| ... ||| refN ||| hypo   -> one stats line
#   EVAL ||| stats1 ||| ... ||| statsM         -> M segment scores + final
for line in sys.stdin:
    line = line.rstrip("\\n")
    if line.startswith("SCORE"):
        parts = line.split(" ||| ")
        # stats = "<n_fields> <hypo word count>"
        print(f"{{len(parts)}} {{len(parts[-1].split())}}")
        sys.stdout.flush()
    elif line.startswith("EVAL"):
        segs = line.split(" ||| ")[1:]
        scores = [float(s.split()[1]) / 10.0 for s in segs]
        for s in scores:
            print(f"{{s:.4f}}")
        print(f"{{sum(scores) / len(scores):.4f}}")
        sys.stdout.flush()
"""

_FAKE_SPICE = """#!{python}
import json, sys
# Emulates spice-1.0.jar: java -jar X in.json -cache C -out out.json ...
args = sys.argv[1:]
# args = ["-jar", "-Xmx8G", <jar>, <in.json>, "-cache", ...]
in_path = args[args.index("-jar") + 3] if "-jar" in args else args[0]
out_path = args[args.index("-out") + 1]
with open(in_path) as f:
    data = json.load(f)
out = [{{"image_id": d["image_id"],
        "scores": {{"All": {{"f": 0.1 * len(d["test"].split())}}}}}}
       for d in data]
with open(out_path, "w") as f:
    json.dump(out, f)
"""


@pytest.fixture
def jar_dir(tmp_path, monkeypatch):
    """Fake java on PATH + placeholder jars so available() is True."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    java = bindir / "java"
    # dispatch on the jar name: java -jar [-XmxNG] <jar> ...
    java.write_text(
        "#!/bin/sh\n"
        f'case "$*" in *{METEOR_JAR}*) exec "{tmp_path}/meteor.py";;'
        f' *{SPICE_JAR}*) exec "{tmp_path}/spice.py" "$@";; esac\n')
    meteor = tmp_path / "meteor.py"
    meteor.write_text(_FAKE_METEOR.format(python=sys.executable))
    spice = tmp_path / "spice.py"
    spice.write_text(_FAKE_SPICE.format(python=sys.executable))
    for f in (java, meteor, spice):
        f.chmod(f.stat().st_mode | stat.S_IEXEC)
    (tmp_path / METEOR_JAR).write_text("")
    (tmp_path / SPICE_JAR).write_text("")
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")
    return str(tmp_path)


class TestMeteorProtocol:
    def test_score_ordering_and_final(self, jar_dir):
        m = MeteorScorer(jar_dir)
        assert m.available()
        gts = {1: ["a cat sits", "a cat"], 2: ["dogs run fast"]}
        res = {1: ["one two three"], 2: ["one two three four five"]}
        final, scores = m.compute_score(gts, res)
        m.close()
        # fake: per-segment score = hypo word count / 10, final = mean
        np.testing.assert_allclose(scores, [0.3, 0.5], atol=1e-6)
        np.testing.assert_allclose(final, 0.4, atol=1e-6)

    def test_separator_sanitised(self, jar_dir):
        """A '|||' inside a caption must not add protocol fields
        (meteor.py:53-54)."""
        m = MeteorScorer(jar_dir)
        gts = {1: ["ref ||| with separator", "clean ref"]}
        res = {1: ["hypo ||| sneaky"]}
        final, scores = m.compute_score(gts, res)
        m.close()
        # fake's stats field 0 is the SCORE-line field count: would be > 4
        # if the ||| leaked through. 4 fields -> hypo has 3 words after
        # sanitization ("hypo  sneaky" -> "hypo sneaky" = 2 words).
        np.testing.assert_allclose(scores, [0.2], atol=1e-6)

    def test_process_reuse(self, jar_dir):
        m = MeteorScorer(jar_dir)
        f1, _ = m.compute_score({1: ["r"]}, {1: ["one two"]})
        proc = m._proc
        f2, _ = m.compute_score({1: ["r"]}, {1: ["one two"]})
        assert m._proc is proc  # one persistent subprocess, like meteor.py
        assert f1 == f2
        m.close()
        assert m._proc is None

    def test_unavailable_raises(self, tmp_path):
        m = MeteorScorer(str(tmp_path))  # no jar
        assert not m.available()
        with pytest.raises(RuntimeError):
            m.compute_score({1: ["r"]}, {1: ["h"]})


class TestSpiceProtocol:
    def test_json_roundtrip(self, jar_dir):
        s = SpiceScorer(jar_dir)
        assert s.available()
        gts = {7: ["a reference"], "str-id": ["another"]}
        res = {7: ["one two"], "str-id": ["one two three four"]}
        final, scores = s.compute_score(gts, res)
        np.testing.assert_allclose(final, (0.2 + 0.4) / 2, atol=1e-6)
        assert scores[0]["All"]["f"] == pytest.approx(0.2)

    def test_unavailable_raises(self, tmp_path):
        s = SpiceScorer(str(tmp_path))
        assert not s.available()
        with pytest.raises(RuntimeError):
            s.compute_score({1: ["r"]}, {1: ["h"]})
