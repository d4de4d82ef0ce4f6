"""Generalized 1x1 horizontal merge across the inception zoo: measured A/B.

Round-5 follow-up to tools/encoder_merge_probe.py (which measured the
flagship inception_v1 at 1.109x and got the merge adopted). The merge was
then generalized behind layers.merged_1x1_bn_relu and measured per-net
here: each leg times the end-to-end encoder forward with the input-side
1x1 convs merged vs per-branch, sharing every other line of the model
(v2/resnet_v2: swap the helper for a per-branch loop; v3/v4: the
apply_mixed_block merge_1x1 flag).

Methodology (CLAUDE.md): pipelined dispatch, scalar-reduced outputs (raw
fmap sync would ship tens of MB over the ~40 MB/s tunnel and swamp
compute), bf16 compute dtype as in production serving, random init params
(timing is weight-value independent), best-of-2 measurement rounds.

Run: python tools/merge_zoo_probe.py   (on the real TPU; ~5 min compile)

Measured 2026-08-19, two runs (TPU v5e axon tunnel, b64, bf16, default
input sizes; second run best-of-2 rounds per leg):
    net                  per-branch   merged     speedup (run1 / run2)
    inception_v2           5.586 ms   5.285 ms   1.076x / 1.057x  WIN
    inception_v3          12.919 ms  13.441 ms   0.974x / 0.961x  LOSS
    inception_v4          21.222 ms  21.610 ms   0.985x / 0.982x  LOSS
    inception_resnet_v2   26.655 ms  23.292 ms   1.141x / 1.144x  WIN
DECISION: merge kept ON for inception v1 (1.109x at b128,
tools/encoder_merge_probe.py), v2 and inception_resnet_v2; kept OFF
(merge_1x1=False default in inception_v3.apply_mixed_block) for v3/v4,
whose wide factorized 7x1/1x7 tails already fill the MXU — there the
merge's extra split/concat costs more than the lane padding it saves.
Both directions are reproducible across runs (the v3/v4 loss is 2-4x the
run-to-run jitter on these legs). Numerics of the merged form are pinned
by tests/test_encoders.py::TestMerged1x1 (f32 exact) and the composed TF
goldens.
"""

import functools
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import _pipelined_ms
    from comic_tpu.models import (inception_resnet_v2, inception_v2,
                                  inception_v3, inception_v4, layers)

    merged_impl = layers.merged_1x1_bn_relu
    block_impl = inception_v3.apply_mixed_block

    def per_branch(parts, x, eps, dtype=None):
        outs = []
        xin = x if dtype is None else x.astype(dtype)
        for q in parts:
            w = q["weights"]
            y = jax.lax.conv_general_dilated(
                xin, w.astype(xin.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ).astype(jnp.float32)
            bn = q["BatchNorm"]
            outs.append(jax.nn.relu(
                (y - bn["moving_mean"])
                * jax.lax.rsqrt(bn["moving_variance"] + eps)
                + bn["beta"]))
        return outs

    def set_mode(merged: bool):
        # v2/resnet_v2 call layers.merged_1x1_bn_relu directly; v3 and v4
        # go through apply_mixed_block (v4 imported the symbol, so patch
        # both module globals)
        layers.merged_1x1_bn_relu = merged_impl if merged else per_branch
        flagged = functools.partial(block_impl, merge_1x1=merged)
        inception_v3.apply_mixed_block = flagged
        inception_v4.apply_mixed_block = flagged

    def restore():
        layers.merged_1x1_bn_relu = merged_impl
        inception_v3.apply_mixed_block = block_impl
        inception_v4.apply_mixed_block = block_impl

    batch = 64
    rng = np.random.default_rng(0)
    sync = lambda o: np.asarray(o)
    nets = [("inception_v2", inception_v2),
            ("inception_v3", inception_v3),
            ("inception_v4", inception_v4),
            ("inception_resnet_v2", inception_resnet_v2)]
    for name, mod in nets:
        size = mod.DEFAULT_IMAGE_SIZE
        params = mod.init_params(jax.random.PRNGKey(0))
        images = jnp.asarray(
            rng.normal(size=(batch, size, size, 3)).astype("float32"))

        def fwd(p, x, _mod=mod):
            net, _ = _mod.apply(p, x, dtype=jnp.bfloat16)
            return net.astype(jnp.float32).sum()

        times = {}
        for label, merged in (("per-branch", False), ("merged", True)):
            set_mode(merged)
            try:
                fn = jax.jit(lambda p, x, _f=fwd: _f(p, x))
                # best-of-2 rounds: a whole measurement round can absorb
                # tunnel jitter (CLAUDE.md); compile caches so round 2 is
                # nearly free
                times[label] = min(
                    _pipelined_ms(fn, (params, images), iters=30,
                                  sync=sync)
                    for _ in range(2))
            finally:
                restore()
        speedup = times["per-branch"] / times["merged"]
        print(f"{name:22s} per-branch {times['per-branch']:7.3f} ms  "
              f"merged {times['merged']:7.3f} ms  {speedup:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
