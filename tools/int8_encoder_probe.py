"""Int8 encoder quantization: measure it, then adopt or close (VERDICT r3 #7).

The encoder (inception_v1 + attention precompute) is ~6.9 ms of the
22.4 ms b128 serving batch. This tool measures, on the real TPU:

  1. encoder forward b128 in the serving compute dtype (bf16) — baseline
  2. the same network with every conv in int8: static per-output-channel
     weight scales (absmax/127, computed once outside the loop) + dynamic
     per-tensor activation scales (absmax/127, one reduction per layer),
     conv int8 x int8 -> int32 on the MXU int8 path, rescale to f32 for
     the fused BN+ReLU
  3. feature fidelity: relative error + cosine of Mixed_4f fmaps and the
     pooled Mixed_5c embedding vs the f32 reference on random images

Decision rule mirrors the Pallas close-out (ops/grouped_attention.py):
adopt only if (2) is meaningfully faster AND (3) keeps the serving
CIDEr-parity budget safe; otherwise write the measured negative result.

MEASURED RESULT (2026-08-17, v5e via axon tunnel, b128, pipelined
methodology) — **negative, closed; serving stays bf16**:

    encoder+precompute bf16: 6.11 ms    int8: 9.48 ms    (0.645x — SLOWER)
    fidelity vs f32: Mixed_4f fmaps rel-err 2.9% / cosine 0.99957,
                     pooled embedding rel-err 1.4% / cosine 0.99991

Why int8 loses here: inception_v1 at 224px is made of SMALL convs
(1x1/3x3 on 14x14..56x56 maps, <=832 ch) — each MXU pass is already
tiny, so halving MXU time saves <1 ms total, while dynamic activation
quantization adds per-layer VPU work (abs-max reduction + round/clip
+ rescale = 3 extra elementwise passes over every fmap) on the SAME
VPU that is this model's serving bottleneck. The encoder is
bandwidth/VPU-dominated, not MXU-dominated, so int8's only win (MXU
throughput) buys nothing. Static activation scales would remove the
reduction but not the round/clip/rescale passes, and 2.9% fmap error
already eats multiples of the +-0.5% CIDEr parity budget — not worth
pursuing on this architecture. (A ViT-scale encoder with big matmuls
would reach a different verdict.)

Usage: python tools/int8_encoder_probe.py   (runs on the session TPU)
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def quantize_weights(params):
    """Per-output-channel int8 weights + f32 scales for every conv leaf."""
    import jax
    import jax.numpy as jnp

    def f(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name != "weights" or leaf.ndim != 4:
            return leaf
        s = jnp.max(jnp.abs(leaf), axis=(0, 1, 2)) / 127.0  # (O,)
        q = jnp.clip(jnp.round(leaf / s), -127, 127).astype(jnp.int8)
        return {"q": q, "scale": s}

    return jax.tree_util.tree_map_with_path(f, params)


def make_int8_apply():
    """inception_v1.apply twin with int8 convs (same block table)."""
    import jax
    import jax.numpy as jnp

    from comic_tpu.models import inception_v1 as iv1

    def conv_bn_relu_q(p, x, stride):
        s_x = jnp.max(jnp.abs(x)) / 127.0
        xq = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, p["weights"]["q"], window_strides=(stride, stride),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * p["weights"]["scale"])
        bn = p["BatchNorm"]
        inv = jax.lax.rsqrt(bn["moving_variance"] + iv1.BN_EPS)
        return jax.nn.relu((y - bn["moving_mean"]) * inv + bn["beta"])

    def mixed_q(p, x):
        b0 = conv_bn_relu_q(p["Branch_0"]["Conv2d_0a_1x1"], x, 1)
        b1 = conv_bn_relu_q(p["Branch_1"]["Conv2d_0a_1x1"], x, 1)
        b1 = conv_bn_relu_q(p["Branch_1"]["Conv2d_0b_3x3"], b1, 1)
        b2 = conv_bn_relu_q(p["Branch_2"]["Conv2d_0a_1x1"], x, 1)
        b2 = conv_bn_relu_q(p["Branch_2"]["Conv2d_0b_3x3"], b2, 1)
        b3 = iv1._max_pool(x, 3, 1)
        b3 = conv_bn_relu_q(p["Branch_3"]["Conv2d_0b_1x1"], b3, 1)
        return jnp.concatenate([b0, b1, b2, b3], axis=3)

    def apply_q(params, images):
        end_points = {}
        net = images
        for name, kind, spec in iv1._V1_BLOCKS:
            if kind == "conv":
                _, _, stride = spec
                net = conv_bn_relu_q(params[name], net, stride)
            elif kind == "pool":
                k, stride = spec
                net = iv1._max_pool(net, k, stride)
            else:
                net = mixed_q(params[name], net)
            end_points[name] = net
        return net, end_points

    return apply_q


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bench import _pipelined_ms
    from comic_tpu.data.preprocessing import preprocess_batch
    from comic_tpu.models import inception_v1 as iv1
    from comic_tpu.models.attention import precompute
    from comic_tpu.models.captioner import build_model_spec
    from bench import real_vocab

    config, spec, params = _flagship()
    spec = build_model_spec(config, real_vocab())
    h, w = config.cnn_input_size
    batch = 128
    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(
        rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
    cnn = params["encoder"]["cnn"]
    attn = params["decoder"]["attention"]
    dcfg = spec.decoder

    def encoder_bf16(cnn, attn, images_u8):
        images = preprocess_batch(images_u8, jax.random.PRNGKey(0), h, w,
                                  False)
        net, ep = iv1.apply(cnn, images, dtype=spec.compute_dtype)
        emb = iv1.pooled_features(net)
        fm = ep[spec.fm_endpoint]
        b, fh, fw, c = fm.shape
        mem = precompute(attn, dcfg.attention, fm.reshape(b, fh * fw, c),
                         dtype=spec.compute_dtype)
        return emb, mem.keys

    apply_q = make_int8_apply()
    cnn_q = quantize_weights(cnn)

    def encoder_int8(cnn_q, attn, images_u8):
        images = preprocess_batch(images_u8, jax.random.PRNGKey(0), h, w,
                                  False)
        net, ep = apply_q(cnn_q, images)
        emb = iv1.pooled_features(net)
        fm = ep[spec.fm_endpoint]
        b, fh, fw, c = fm.shape
        mem = precompute(attn, dcfg.attention, fm.reshape(b, fh * fw, c),
                         dtype=spec.compute_dtype)
        return emb, mem.keys

    sync = lambda o: np.asarray(o[0])
    ms_bf16 = _pipelined_ms(jax.jit(encoder_bf16), (cnn, attn, images_u8),
                            iters=50, sync=sync)
    print(f"encoder+precompute bf16 b{batch}: {ms_bf16:.2f} ms",
          file=sys.stderr)
    ms_int8 = _pipelined_ms(jax.jit(encoder_int8), (cnn_q, attn, images_u8),
                            iters=50, sync=sync)
    print(f"encoder+precompute int8 b{batch}: {ms_int8:.2f} ms",
          file=sys.stderr)

    # fidelity vs f32 on a small batch (host math, exact)
    small = jnp.asarray(
        rng.integers(0, 256, (8, 256, 256, 3), dtype=np.uint8))
    images = preprocess_batch(small, jax.random.PRNGKey(0), h, w, False)
    net32, ep32 = iv1.apply(cnn, images)                   # f32 reference
    netq, epq = apply_q(cnn_q, images)
    emb32 = np.asarray(iv1.pooled_features(net32))
    embq = np.asarray(iv1.pooled_features(netq))
    fm32 = np.asarray(ep32[spec.fm_endpoint])
    fmq = np.asarray(epq[spec.fm_endpoint])

    def rel(a, b):
        return float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12))

    def cos(a, b):
        a, b = a.reshape(len(a), -1), b.reshape(len(b), -1)
        num = (a * b).sum(1)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
        return float((num / den).mean())

    out = {
        "encoder_ms_bf16_b128": round(ms_bf16, 2),
        "encoder_ms_int8_b128": round(ms_int8, 2),
        "speedup": round(ms_bf16 / ms_int8, 3),
        "emb_rel_err": round(rel(emb32, embq), 5),
        "emb_cosine": round(cos(emb32, embq), 6),
        "fmaps_rel_err": round(rel(fm32, fmq), 5),
        "fmaps_cosine": round(cos(fm32, fmq), 6),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
