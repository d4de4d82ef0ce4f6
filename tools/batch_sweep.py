"""Serving batch-size sweep: localize the >b128 throughput cliff.

Measures, per batch size, three nested programs on the real TPU:

  serve_total  uint8 images -> preprocess -> encoder -> 60-step beam-3
               decode (the bench_serving program, unreachable EOS)
  decode_only  beam_search_from_memory on device-resident im_embed +
               attention memory (no encoder, no preprocess)
  attn_only    a bare 60-step lax.scan over attend_grouped on the same
               memory — the per-step VPU-bound hot op in isolation

Comparing where the per-caption cost jumps across the three layers
pins the cliff to (a) the attention chain's tiling, (b) beam
bookkeeping/gathers, or (c) the encoder — without trace spelunking.

Usage: python tools/batch_sweep.py [b1 b2 ...]   (defaults below)
Writes one JSON line per batch to stdout; human table to stderr.

Findings land in CLAUDE.md + the decode batch fence
(comic_tpu/decoding/search.py _warn_if_memory_spills). VERDICT r3 item #5.

Measured r4 (TPU v5e via axon tunnel, COMIC-256, beam 3, 60 steps):

  batch rows  serve_ms decode_ms attn_ms  attn_us/step  us/row
    64   192   16.28     10.45     8.06      134.3       0.70
   112   336   22.37     17.53    12.78      213.0       0.63
   128   384   23.08     18.13    13.75      229.2       0.60  <- best
   136   408   28.51     24.32    19.56      325.9       0.80  <- cliff
   144   432   31.74     27.52    21.20      353.3       0.82
   160   480   40.11     31.61    28.15      469.2       0.98
   192   576   48.19     40.36    33.22      553.6       0.96
   256   768   51.97     44.43    36.95      615.8       0.80

Localization: the jump is entirely inside attn_only (the bare
attend_grouped scan) — beam bookkeeping (decode-attn ~= 4.4-4.8 ms) and
encoder+preprocess (serve-decode ~= 5 ms) stay flat across the cliff.
Cause: attention keys+values are decode-loop-invariant; at b128 they
total 51.4 MB (2 x 128 x 196 x 512 x 2B) and XLA keeps them
VMEM-resident across the scan; at b136 (54.6 MB) they no longer fit and
are re-streamed from HBM every step. Predicted streaming cost
54.6 MB / 819 GB/s = 67 us/step; measured step delta vs the per-row
trend = +69 us/step. Every batch past the boundary settles at
~0.80 us/row (HBM-streamed) vs 0.60 (resident). Rule: keep
2*B*L*U*itemsize under ~52 MB — for COMIC-256 bf16 that is B <= 128.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bench import _pipelined_ms, real_vocab
    from comic_tpu.data.preprocessing import preprocess_batch
    from comic_tpu.decoding import beam_search
    from comic_tpu.decoding.search import beam_search_from_memory
    from comic_tpu.models.attention import attend_grouped, precompute
    from comic_tpu.models.captioner import build_model_spec, \
        max_decode_steps
    from comic_tpu.models.encoders import encode_images

    config, spec, params = _flagship()
    vocab = real_vocab()
    spec = build_model_spec(config, vocab)
    beam = int(config.infer_beam_size)
    steps = max_decode_steps(config, vocab)
    serve_spec = spec._replace(decoder=spec.decoder._replace(end_id=-1))
    dcfg = serve_spec.decoder
    h, w = config.cnn_input_size
    rng = np.random.default_rng(0)

    batches = ([int(a) for a in sys.argv[1:]]
               or [64, 112, 128, 136, 144, 160, 192, 256])

    def serve(params, images_u8):
        images = preprocess_batch(images_u8, jax.random.PRNGKey(0), h, w,
                                  False)
        top, _ = beam_search(params, serve_spec, images, beam_size=beam,
                             max_steps=steps, length_penalty=0.0,
                             collect_alignments=False, early_exit=True)
        return top.ids

    def decode_only(dec_params, im_embed, memory):
        top, _ = beam_search_from_memory(
            dec_params, serve_spec, im_embed, memory, beam_size=beam,
            max_steps=steps, length_penalty=0.0,
            collect_alignments=False, early_exit=True)
        return top.ids

    def attn_only(p_attn, query0, memory):
        def body(q, _):
            ctx, _align = attend_grouped(p_attn, dcfg.attention, q, memory,
                                         dtype=serve_spec.compute_dtype)
            return jnp.tanh(ctx).astype(q.dtype), ()

        q, _ = jax.lax.scan(body, query0, None, length=steps)
        return q

    enc_p = params["encoder"]
    dec_p = params["decoder"]
    sync = lambda o: np.asarray(o)

    for batch in batches:
        images_u8 = jnp.asarray(
            rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
        row = {"batch": batch, "rows": batch * beam, "steps": steps}
        t0 = time.time()
        ms = _pipelined_ms(jax.jit(serve), (params, images_u8), iters=30,
                           sync=sync)
        row["serve_ms"] = round(ms, 2)
        row["captions_per_s"] = round(batch / (ms / 1e3), 1)

        # device-resident handoff state for the inner layers
        images = preprocess_batch(images_u8, jax.random.PRNGKey(0), h, w,
                                  False)
        im_embed, fmaps = encode_images(enc_p, images, spec.cnn_name,
                                        spec.fm_endpoint,
                                        dtype=spec.compute_dtype)
        memory = precompute(dec_p["attention"], dcfg.attention, fmaps,
                            dtype=spec.compute_dtype)
        ms = _pipelined_ms(jax.jit(decode_only), (dec_p, im_embed, memory),
                           iters=30, sync=sync)
        row["decode_ms"] = round(ms, 2)

        query0 = jnp.asarray(
            rng.standard_normal((batch, beam, dcfg.rnn_size)),
            jnp.float32)
        ms = _pipelined_ms(jax.jit(attn_only),
                           (dec_p["attention"], query0, memory),
                           iters=30, sync=sync)
        row["attn_ms"] = round(ms, 2)
        row["attn_us_per_step"] = round(ms * 1e3 / steps, 1)
        row["compile_and_measure_s"] = round(time.time() - t0, 1)
        print(json.dumps(row), flush=True)
        print(f"b{batch:<4} rows {batch*beam:<4} serve {row['serve_ms']:>7} "
              f"decode {row['decode_ms']:>7} attn {row['attn_ms']:>6} ms "
              f"({row['captions_per_s']} cap/s)", file=sys.stderr,
              flush=True)


if __name__ == "__main__":
    main()
