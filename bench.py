"""Benchmark: captions/sec/chip for beam-3 inference on the flagship model.

Measures the full serving path — uint8 image batch -> on-device
preprocessing -> Inception-V1 -> radix-256 attention-LSTM beam search
(beam 3, max length 30 words = 60 radix steps) — as ONE jitted program on
the available accelerator, mirroring the reference's operating point
(batch 25 beam 3, src/infer.py:61-72; throughput artifact
`infer_speed.txt`, src/infer_fn.py:176-184).

Baseline: the reference publishes no captions/sec figure (BASELINE.md).
TF1 benchmarks of comparable LSTM beam-3 decoders with an Inception
encoder on the era's single GPU land at tens of captions/sec; we use
50 captions/sec as the reference estimate for `vs_baseline` and record the
absolute number as the real metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_CAPTIONS_PER_SEC = 50.0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from comic_tpu.data.preprocessing import preprocess_batch
    from comic_tpu.decoding import beam_search
    from comic_tpu.models.captioner import max_decode_steps
    from comic_tpu.tokenization import Vocabulary

    config, spec, params = _flagship()
    # Worst-case honest decode: with random weights beam search can emit EOS
    # early; an unreachable end id forces all max_steps iterations so the
    # number reflects full-length caption generation.
    spec = spec._replace(decoder=spec.decoder._replace(end_id=-1))
    beam = int(config.infer_beam_size)  # 3
    # radix max steps: 30 words x 2 digits
    wtoi = {"<PAD>": -1}
    for i in range(50):
        wtoi[f"w{i}"] = i
    wtoi.update({"<UNK>": 50, "<GO>": 51, "<EOS>": 52})
    steps = max_decode_steps(config, Vocabulary(wtoi))

    h, w = config.cnn_input_size

    def serve(params, images_u8):
        images = preprocess_batch(images_u8, jax.random.PRNGKey(0), h, w,
                                  False)
        top, _ = beam_search(params, spec, images, beam_size=beam,
                             max_steps=steps,
                             length_penalty=config.infer_length_penalty_weight)
        return top.ids

    rng = np.random.default_rng(0)
    best = 0.0
    best_batch = 0
    for batch in (64, 128, 256):
        images_u8 = jnp.asarray(
            rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
        jserve = jax.jit(serve)
        try:
            out = np.asarray(jserve(params, images_u8))  # compile + sync
        except Exception as e:  # OOM at large batch etc.
            print(f"batch {batch}: {type(e).__name__}", file=sys.stderr)
            break
        # Pipelined steady-state throughput: dispatch a stream of batches
        # and synchronize once at the end — how a serving pipeline runs,
        # and it amortizes per-call host/tunnel round-trip latency.
        iters = 50
        t0 = time.time()
        outs = [jserve(params, images_u8) for _ in range(iters)]
        out = np.asarray(outs[-1])
        dt = time.time() - t0
        cps = batch * iters / dt
        print(f"batch {batch}: {cps:.1f} captions/s", file=sys.stderr)
        if cps > best:
            best, best_batch = cps, batch

    # reference-artifact continuity: infer_speed.txt line
    with open("infer_speed.txt", "a") as f:
        f.write(f"{best:.2f} captions/sec (batch {best_batch}, beam {beam}, "
                f"max_steps {steps})\n")

    print(json.dumps({
        "metric": "captions_per_sec_per_chip_beam3",
        "value": round(best, 2),
        "unit": "captions/s",
        "vs_baseline": round(best / REFERENCE_CAPTIONS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
