"""Encoder phase split + space-to-depth stem experiment (serving perf).

The serving encoder (inception_v1 + attention precompute, bf16, b128) is
~6.1 ms of the 22.4 ms worst-case batch. Its first conv — Conv2d_1a_7x7,
7x7/stride-2 over THREE input channels (/root/reference/common/nets/
inception_v1.py stem) — is the canonical TPU MXU-underutilization spot:
with Cin=3 the contraction depth is 7*7*3=147 and the channel-minor input
layout pads 3 -> 8/128 lanes, so XLA either pays padded MXU passes or an
internal relayout.

The classic fix (MLPerf ResNet space-to-depth) is an EXACT reparametrization:
  x (B,224,224,3) -> 2x2 space-to-depth -> (B,112,112,12)
  w (7,7,3,64)    -> w4 (4,4,12,64), w4[kr,kc, dr*6+dc*3+ch, o] =
                      w7[2kr+dr, 2kc+dc, ch, o]  (zero where 2k+d == 7)
  conv 7x7/2 SAME (pad 2,3)  ==  conv 4x4/1 explicit pad ((1,2),(1,2))
Same dot products, reassociated; bitwise-equal in f32 up to conv reduction
order. Exactness is pinned by tests/test_stem_s2d.py on CPU.

This tool measures on the real TPU (pipelined methodology, CLAUDE.md):
  1. preprocess_batch alone (uint8 256 -> f32 224 crop+scale)
  2. stem conv alone, regular 7x7/2 vs space-to-depth twin
  3. full encoder+precompute, regular vs s2d stem
Decision rule mirrors tools/int8_encoder_probe.py: adopt in
models/inception_v1.py only if (3) shows a real win; otherwise record the
measured negative result here.

MEASURED RESULT (b128 bf16, v5e, best of pipelined 50-iter rounds):
  preprocess alone          1.235 ms
  stem conv alone   7x7/2   1.267 ms   s2d 4x4/1   1.107 ms   (1.14x)
  FULL encoder+precompute   5.906 ms   s2d stem    5.881 ms   (1.004x)
NEGATIVE (neutral): the 0.16 ms isolated stem win evaporates inside the
full encoder — XLA overlaps/fuses the padded-stem cost with the
preprocess + following layers, so end-to-end the gain is 0.4%, below the
few-percent tunnel jitter. Not worth carrying a second weight layout +
transform through the converter/checkpoint path. Decision: NOT adopted;
kept here (with tests/test_stem_s2d.py pinning exactness) as the third
closed perf experiment alongside Pallas decode attention and the int8
encoder (ops/grouped_attention.py, tools/int8_encoder_probe.py).

Usage: python tools/stem_probe.py   (runs on the session TPU)
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def s2d_weights(w7):
    """(7,7,3,O) slim stem kernel -> (4,4,12,O) space-to-depth kernel."""
    import jax.numpy as jnp

    o = w7.shape[-1]
    w4 = jnp.zeros((4, 4, 12, o), w7.dtype)
    for kr in range(4):
        for dr in range(2):
            kh = 2 * kr + dr
            if kh >= 7:
                continue
            for kc in range(4):
                for dc in range(2):
                    kw = 2 * kc + dc
                    if kw >= 7:
                        continue
                    w4 = w4.at[kr, kc, dr * 6 + dc * 3:dr * 6 + dc * 3 + 3,
                               :].set(w7[kh, kw])
    return w4


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel = dr*2C + dc*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def stem_regular(w7, x):
    import jax

    return jax.lax.conv_general_dilated(
        x, w7, window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stem_s2d(w4, x):
    """Space-to-depth twin of the 7x7/2 SAME stem (exact, see module doc)."""
    import jax

    return jax.lax.conv_general_dilated(
        space_to_depth(x), w4, window_strides=(1, 1),
        padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bench import _pipelined_ms, real_vocab
    from comic_tpu.data.preprocessing import preprocess_batch
    from comic_tpu.models import inception_v1 as iv1
    from comic_tpu.models.attention import precompute
    from comic_tpu.models.captioner import build_model_spec

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
    cdt = spec.compute_dtype

    w7 = cnn["Conv2d_1a_7x7"]["weights"]
    w4 = s2d_weights(w7)

    def prep(images_u8):
        return preprocess_batch(images_u8, jax.random.PRNGKey(0), h, w,
                                False)

    def stem_only(w7, images_u8):
        x = prep(images_u8).astype(cdt)
        return stem_regular(w7.astype(cdt), x)

    def stem_only_s2d(w4, images_u8):
        x = prep(images_u8).astype(cdt)
        return stem_s2d(w4.astype(cdt), x)

    def tail(cnn, attn, net):
        """Everything after the stem conv output (pre-BN)."""
        bn = cnn["Conv2d_1a_7x7"]["BatchNorm"]
        inv = jax.lax.rsqrt(bn["moving_variance"] + iv1.BN_EPS)
        net = jax.nn.relu((net.astype(jnp.float32) - bn["moving_mean"])
                          * inv + bn["beta"])
        end_points = {}
        seen_stem = False
        for name, kind, bspec in iv1._V1_BLOCKS:
            if not seen_stem:
                seen_stem = name == "Conv2d_1a_7x7"
                continue
            if kind == "conv":
                _, _, stride = bspec
                net = iv1._conv_bn_relu(cnn[name], net, stride, cdt)
            elif kind == "pool":
                k, stride = bspec
                net = iv1._max_pool(net, k, stride)
            else:
                net = iv1._mixed_block(cnn[name], net, cdt)
            end_points[name] = net
        emb = iv1.pooled_features(net)
        fm = end_points[spec.fm_endpoint]
        b, fh, fw, c = fm.shape
        mem = precompute(attn, dcfg.attention, fm.reshape(b, fh * fw, c),
                         dtype=cdt)
        return emb, mem.keys

    def encoder_regular(cnn, attn, images_u8):
        return tail(cnn, attn, stem_only(w7, images_u8))

    def encoder_s2d(cnn, attn, images_u8):
        return tail(cnn, attn, stem_only_s2d(w4, images_u8))

    # exactness spot check on device (f32): identical math, conv order aside
    xs = prep(images_u8[:4])
    np.testing.assert_allclose(
        np.asarray(stem_regular(w7, xs)), np.asarray(stem_s2d(w4, xs)),
        rtol=2e-5, atol=2e-5)

    out = {}
    out["preprocess_ms"] = round(_pipelined_ms(
        jax.jit(prep), (images_u8,), iters=50,
        sync=lambda o: np.asarray(o[0, 0, 0])), 3)
    out["stem_ms_regular"] = round(_pipelined_ms(
        jax.jit(stem_only), (w7, images_u8), iters=50,
        sync=lambda o: np.asarray(o[0, 0, 0])), 3)
    out["stem_ms_s2d"] = round(_pipelined_ms(
        jax.jit(stem_only_s2d), (w4, images_u8), iters=50,
        sync=lambda o: np.asarray(o[0, 0, 0])), 3)
    sync = lambda o: np.asarray(o[0])
    out["encoder_ms_regular"] = round(_pipelined_ms(
        jax.jit(encoder_regular), (cnn, attn, images_u8), iters=50,
        sync=sync), 3)
    out["encoder_ms_s2d"] = round(_pipelined_ms(
        jax.jit(encoder_s2d), (cnn, attn, images_u8), iters=50,
        sync=sync), 3)
    out["encoder_speedup_s2d"] = round(
        out["encoder_ms_regular"] / out["encoder_ms_s2d"], 3)
    for k, v in out.items():
        print(f"{k}: {v}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
