"""Inception-V1 horizontal 1x1-conv merge: measured encoder experiment.

VERDICT r4 #6: the encoder+precompute phase is ~6-7 ms of the serve batch
at 0.30 MFU; the inception mixed blocks run THREE independent 1x1 convs
on the same input (Branch_0, Branch_1 reduce, Branch_2 reduce) with small
output counts (16-384) that pad the MXU lanes. XLA does not horizontally
fuse independent convs, but the three are exactly one conv with
concatenated output channels (each output channel is an independent dot
over the same input window), so merging is mathematically exact — frozen
BN is per-output-channel and concatenates along.

This probe measures, at the b128 serving batch on the real TPU:
  A. baseline     production encode_images (Mixed_4f endpoint)
  B. merged_1x1   same network with the three per-block input 1x1 convs
                  (+ their BN affines) concatenated into one conv + split

and reports end-to-end encoder ms + numeric agreement. Adopt in
models/inception_v1.py if A/B shows a real win; otherwise record the
negative result here (like tools/stem_probe.py / int8_encoder_probe.py).

Run: python tools/encoder_merge_probe.py

Measured 2026-08-19 (TPU v5e via axon tunnel, b128, bf16, 224x224):
    baseline (per-branch) 5.162 ms   merged_1x1 4.653 ms   1.109x
    max rel diff 1.1e-6 (f32 exact; bf16 rounding-order ~5e-3)
ADOPTED: models/inception_v1._mixed_block now uses the merged form
(layers.merged_1x1_bn_relu), so re-running this probe measures
production-vs-merged = ~1.0x; the per-branch A-leg of record lives in
tools/merge_zoo_probe.py, which swaps the helper back to a per-branch
loop and covers inception v2/v3/v4 + inception_resnet_v2 as well.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bench import _pipelined_ms
    from comic_tpu.data.preprocessing import preprocess_batch
    from comic_tpu.models import inception_v1 as iv1

    config, spec, params = _flagship()
    h, w = config.cnn_input_size
    enc_p = params["encoder"]["cnn"]
    dtype = spec.compute_dtype
    batch = 128
    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(
        rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))

    def baseline(p, images_u8):
        images = preprocess_batch(images_u8, jax.random.PRNGKey(0), h, w,
                                  False)
        net, _ = iv1.apply(p, images, final_endpoint="Mixed_4f",
                           dtype=dtype)
        return net

    def merged_mixed_block(p, x):
        """One conv for the three input-side 1x1s, then split + BN."""
        w0 = p["Branch_0"]["Conv2d_0a_1x1"]
        w1 = p["Branch_1"]["Conv2d_0a_1x1"]
        w2 = p["Branch_2"]["Conv2d_0a_1x1"]
        parts = [w0, w1, w2]
        wcat = jnp.concatenate([q["weights"] for q in parts], axis=3)
        xin = x.astype(dtype) if dtype is not None else x
        y = jax.lax.conv_general_dilated(
            xin, wcat.astype(xin.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")
        ).astype(jnp.float32)
        mean = jnp.concatenate(
            [q["BatchNorm"]["moving_mean"] for q in parts])
        var = jnp.concatenate(
            [q["BatchNorm"]["moving_variance"] for q in parts])
        beta = jnp.concatenate([q["BatchNorm"]["beta"] for q in parts])
        y = jax.nn.relu((y - mean) * jax.lax.rsqrt(var + iv1.BN_EPS)
                        + beta)
        n0 = w0["weights"].shape[3]
        n1 = n0 + w1["weights"].shape[3]
        b0, b1, b2 = y[..., :n0], y[..., n0:n1], y[..., n1:]
        b1 = iv1._conv_bn_relu(p["Branch_1"]["Conv2d_0b_3x3"], b1, 1,
                               dtype)
        b2 = iv1._conv_bn_relu(p["Branch_2"]["Conv2d_0b_3x3"], b2, 1,
                               dtype)
        b3 = iv1._max_pool(x, 3, 1)
        b3 = iv1._conv_bn_relu(p["Branch_3"]["Conv2d_0b_1x1"], b3, 1,
                               dtype)
        return jnp.concatenate([b0, b1, b2, b3], axis=3)

    def merged(p, images_u8):
        images = preprocess_batch(images_u8, jax.random.PRNGKey(0), h, w,
                                  False)
        net = images
        for name, kind, sp in iv1._V1_BLOCKS:
            if kind == "conv":
                _, _, stride = sp
                net = iv1._conv_bn_relu(p[name], net, stride, dtype)
            elif kind == "pool":
                kk, stride = sp
                net = iv1._max_pool(net, kk, stride)
            else:
                net = merged_mixed_block(p[name], net)
            if name == "Mixed_4f":
                return net
        raise AssertionError

    sync = lambda o: np.asarray(o)
    a = np.asarray(jax.jit(baseline)(enc_p, images_u8))
    b = np.asarray(jax.jit(merged)(enc_p, images_u8))
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    print(f"max rel diff baseline vs merged: {rel:.3e}", flush=True)

    # Time scalar-reduced variants: syncing the raw (128,14,14,832) f32
    # fmap ships 83 MB over the ~40 MB/s tunnel and queues 40 such
    # buffers, which swamps the ~6 ms of compute (first run measured
    # 181 ms/iter on BOTH legs' raw-output form). The sum keeps every
    # conv live and costs one fused reduction.
    base_s = lambda p, x: baseline(p, x).astype(jnp.float32).sum()
    merged_s = lambda p, x: merged(p, x).astype(jnp.float32).sum()
    ms_a = _pipelined_ms(jax.jit(base_s), (enc_p, images_u8), iters=40,
                         sync=sync)
    ms_b = _pipelined_ms(jax.jit(merged_s), (enc_p, images_u8), iters=40,
                         sync=sync)
    print(f"baseline    {ms_a:7.3f} ms")
    print(f"merged_1x1  {ms_b:7.3f} ms   ({ms_a / ms_b:.3f}x)")


if __name__ == "__main__":
    main()
