"""One-command reference-parity gate (STATUS.md playbook, automated).

The moment real COCO data and a published reference checkpoint are
available, this runs the ENTIRE parity chain with zero new code:

    python tools/parity_gate.py \
        --experiment_dir /path/to/reference_experiment \
        --dataset_dir    /path/to/coco_dataset \
        --annotations_file /path/to/captions_annotations.json \
        --target_cider 1.0% value from /root/reference/README.md:221-226 \
        --jar_dir /path/to/jars      # CoreNLP/METEOR/SPICE

Chain: config.pkl ingestion (py2 pickle ok) -> transparent TF
`model_compact-N` checkpoint conversion -> beam-search inference sweep ->
COCO metric scoring (CoreNLP PTB tokenization REQUIRED by default — the
Python fallback is refused because tokenizer skew can exceed the parity
budget; pass --allow_ptb_fallback for rehearsals) -> CIDEr gate:

    PASS  iff  max over checkpoints of CIDEr >= target * (1 - tolerance)

with tolerance defaulting to 0.5% (the SURVEY's parity budget). Exits 0
on PASS, 1 on FAIL, and prints one machine-readable JSON line either way.

Rehearsed end to end against manufactured reference-style experiment
dirs in tests/test_parity_gate.py, including the FAIL leg (wrong weights
must not pass).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--experiment_dir", type=str, required=True,
                   help="Reference experiment dir: config.pkl + "
                        "model_compact-N checkpoints (TF or msgpack).")
    p.add_argument("--dataset_dir", type=str, default=None)
    p.add_argument("--annotations_file", type=str, required=True,
                   help="COCO-format annotation JSON for the scored split.")
    p.add_argument("--target_cider", type=float, required=True,
                   help="Published reference CIDEr for this config "
                        "(README.md:221-226 table).")
    p.add_argument("--tolerance", type=float, default=0.005,
                   help="Relative parity budget (default 0.5%%).")
    p.add_argument("--infer_set", type=str, default="test",
                   choices=["test", "valid", "coco_test", "coco_valid"])
    p.add_argument("--infer_checkpoints", type=str, default="all")
    p.add_argument("--batch_size_infer", type=int, default=None,
                   help="Override config's inference batch.")
    p.add_argument("--infer_beam_size", type=int, default=None)
    p.add_argument("--infer_max_length", type=int, default=None)
    p.add_argument("--jar_dir", type=str, default="")
    p.add_argument("--allow_ptb_fallback", action="store_true",
                   help="Score through the Python PTB tokenizer when no "
                        "jar is available. Rehearsals only: the resulting "
                        "numbers are NOT parity evidence.")
    return p


def run(args) -> dict:
    from comic_tpu.configuration import load_config
    from comic_tpu.inference import sweep_checkpoints

    config = load_config(args.experiment_dir)
    config.update(log_path=args.experiment_dir, infer_set=args.infer_set)
    if args.dataset_dir:
        config.dataset_dir = args.dataset_dir
    for name in ("batch_size_infer", "infer_beam_size", "infer_max_length"):
        val = getattr(args, name)
        if val is not None:
            setattr(config, name, val)
    if args.infer_set == "coco_valid":  # forced server-split batch
        config.batch_size_infer = 61

    results = sweep_checkpoints(
        config, annotations_file=args.annotations_file,
        jar_dir=args.jar_dir, checkpoints=args.infer_checkpoints,
        require_ptb_jar=not args.allow_ptb_fallback)
    if not results:
        raise RuntimeError("No checkpoint produced scores — nothing to "
                           "gate (check --infer_checkpoints and the "
                           "experiment dir).")
    per_ckpt = {name: scores.get("CIDEr") for name, scores in results.items()}
    missing = [n for n, c in per_ckpt.items() if c is None]
    if missing:
        raise RuntimeError(f"CIDEr missing from scores for {missing}")
    best_name = max(per_ckpt, key=per_ckpt.get)
    best = float(per_ckpt[best_name])
    threshold = args.target_cider * (1.0 - args.tolerance)
    return {
        "passed": bool(best >= threshold),
        "best_checkpoint": best_name,
        "best_cider": best,
        "target_cider": args.target_cider,
        "tolerance": args.tolerance,
        "threshold": threshold,
        "tokenizer": "corenlp_jar" if not args.allow_ptb_fallback
                     else "python_fallback_allowed",
        "per_checkpoint_cider": per_ckpt,
    }


def main(argv=None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    args = create_parser().parse_args(argv)
    verdict = run(args)
    print(json.dumps(verdict))
    print(f"PARITY {'PASS' if verdict['passed'] else 'FAIL'}: best CIDEr "
          f"{verdict['best_cider']:.4f} ({verdict['best_checkpoint']}) vs "
          f"threshold {verdict['threshold']:.4f} "
          f"(target {verdict['target_cider']:.4f} - "
          f"{verdict['tolerance']:.1%})")
    return 0 if verdict["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
