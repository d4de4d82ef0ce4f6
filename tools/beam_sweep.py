"""Serving beam-size sweep at the COMIC-256 operating point (b128).

Companion to tools/batch_sweep.py: batches sweep the attention-memory
footprint (keys+values are PER-IMAGE — beam-grouped attention reads one
untiled copy per image, models/attention.py attend_grouped), while beams
sweep only the VPU row count (rows = batch x beam). The VMEM-residency
model therefore predicts NO cliff in beam: at b128 the memory stays
51.4 MB for every beam size, and the decode step should scale with rows
at the measured ~0.60 us/beam-row VMEM-resident rate.

Usage: python tools/beam_sweep.py [k1 k2 ...]   (default 3 1 2 5 7 —
beam 3 first: its shape family is the bench-validated compile, so a
flaky remote-compile session still yields the headline point first)
One JSON line per beam to stdout; human table to stderr.

MEASURED (2026-08-18, axon v5e, b128, 60 steps, early-exit off-path,
pipelined x30):

    beam 1:  17.01 ms   7524.8 captions/s  (128 rows)
    beam 2:  19.67 ms   6508.8 captions/s  (256 rows)
    beam 3:  23.27 ms   5500.6 captions/s  (384 rows)   <- headline point
    beam 5:  34.74 ms   3684.1 captions/s  (640 rows)
    beam 7:  40.40 ms   3168.4 captions/s  (896 rows)

Prediction confirmed: NO cliff through beam 7 (896 rows), while the
batch sweep cliffs at b136 (408 rows) — the K/V footprint really is
per-image. Incremental decode cost is ~0.37-0.75 us/beam-row/step
(vs the 0.60 us/row VMEM-resident batch-sweep rate); the beam-5 point
(640 rows) runs a slightly worse tiling but recovers by beam 7. The
fixed ~14.5 ms floor (encoder + precompute + beam-1 decode dispatch)
dominates small beams: beam 7 costs only 2.4x beam 1, not 7x.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bench import _pipelined_ms, real_vocab
    from comic_tpu.data.preprocessing import preprocess_batch
    from comic_tpu.decoding import beam_search, greedy_or_sample
    from comic_tpu.models.captioner import build_model_spec, \
        max_decode_steps

    config, spec, params = _flagship()
    vocab = real_vocab()
    spec = build_model_spec(config, vocab)
    steps = max_decode_steps(config, vocab)
    serve_spec = spec._replace(decoder=spec.decoder._replace(end_id=-1))
    h, w = config.cnn_input_size
    rng = np.random.default_rng(0)

    batch = 128
    beams = [int(a) for a in sys.argv[1:]] or [3, 1, 2, 5, 7]
    # device-resident pool: host numpy here would make every timed call
    # pay ~600 ms of axon-tunnel transfer (25 MB at ~40 MB/s) and the
    # sweep would measure the transfer floor, not the decode (CLAUDE.md)
    images_u8 = jnp.asarray(
        rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
    sync = lambda o: np.asarray(o)

    for k in beams:
        if k == 1:
            def serve(params, images_u8):
                images = preprocess_batch(images_u8, jax.random.PRNGKey(0),
                                          h, w, False)
                out = greedy_or_sample(params, serve_spec, images,
                                       max_steps=steps,
                                       collect_alignments=False,
                                       early_exit=True)
                return out.ids
        else:
            def serve(params, images_u8, k=k):
                images = preprocess_batch(images_u8, jax.random.PRNGKey(0),
                                          h, w, False)
                top, _ = beam_search(params, serve_spec, images,
                                     beam_size=k, max_steps=steps,
                                     length_penalty=0.0,
                                     collect_alignments=False,
                                     early_exit=True)
                return top.ids

        ms = _pipelined_ms(jax.jit(serve), (params, images_u8), iters=30,
                           sync=sync)
        cps = batch / (ms / 1e3)
        row = {"beam": k, "rows": batch * k, "serve_ms": round(ms, 2),
               "captions_per_s": round(cps, 1)}
        print(json.dumps(row))
        print(f"beam {k}: {ms:.2f} ms  {cps:.1f} captions/s "
              f"({batch * k} rows)", file=sys.stderr)


if __name__ == "__main__":
    main()
