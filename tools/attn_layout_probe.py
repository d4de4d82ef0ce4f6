"""Unified head-major attention-memory layout: the one-buffer decode step.

Follow-up to tools/vpu_peak.py. The r4 decode loop keeps TWO 25.7 MB
loop-invariant tensors resident (keys (B,L,U) for the score chain +
values (B,H,L,D) for the context dot) -> 51.4 MB at b128, spilling at
b136 (tools/batch_sweep.py). Dropping the materialized values
(contracting against a keys reshape view) does NOT help end to end: the
MXU needs an (l,d)-contiguous operand, so XLA re-materializes the
transpose anyway (measured: b128 serve 23.1 -> 29.4 ms, attn 229 -> 334
us/step — the two CSE'd layouts hit the VMEM boundary exactly).

The fix probed here: store the tied attention memory ONLY in the
head-major (B,H,L,D) layout and run the WHOLE step from it —
  score   elementwise over (B,K,H,L,D) with closed-form LN stats
          (mu/var are per-(B,L) scalars: layout-independent), head-sum
          over D -> (B,K,H,L) directly (the (0,1,3,2) transpose of the
          channel-major score path disappears too)
  cross   E[k*q] via einsum "bhld,bkhd->bkl" (contract {h,d}=512 — one
          MXU matmul, same FLOPs as the channel-major cross term)
  context einsum "bkhl,bhld->bkhd" in its NATIVE layout
so the decode loop carries ONE loop-invariant buffer in ONE layout:
25.7 MB at b128 -> VMEM-resident through ~b256.

Compares per-step (slope method, dispatch-free) and in a 60-step scan at
several batches:
  attn_r4     r4 path: channel-major keys + materialized values
  attn_hld    unified head-major layout

Run: python tools/attn_layout_probe.py [b1 b2 ...]

Measured 2026-08-19 (TPU v5e via axon tunnel, slope method, 16/128-step
lengths):

  b128  attn_r4 165.9 us/step   attn_hld 176.7 us/step   rel 2.5e-04
  b192  attn_r4 346.2 us/step   attn_hld 364.6 us/step   rel 0

NEGATIVE RESULT -- closed. The unified head-major layout is ~6% SLOWER
at both batches despite carrying half the loop-invariant bytes and
dropping the score transpose: the (B,K,H,L,D) elementwise volume with
per-(B,L) LN statistics broadcast across the split D-minor axis codegens
worse than the channel-major (B,K,L,U) sweep (the VPU wants the 512-wide
contiguous lane dimension), and D=64-minor dots pad the MXU. Both
layout alternatives to the r4 design (this, and the keys-view
contraction -- tools/vpu_peak.py conclusions) measured worse end to end,
so the r4 two-buffer channel-major design is certified the best of the
three and kept.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bench import _slope_us_per_step, real_vocab
    from comic_tpu.models.attention import (LN_EPS, _probability,
                                            split_heads)
    from comic_tpu.models.captioner import build_model_spec
    from comic_tpu.models.layers import dense_apply

    config, spec, params = _flagship()
    vocab = real_vocab()
    spec = build_model_spec(config, vocab)
    beam = int(config.infer_beam_size)
    acfg = spec.decoder.attention
    l, u, h = 196, acfg.num_units, acfg.num_heads
    d = u // h
    p_attn = params["decoder"]["attention"]
    rng = np.random.default_rng(7)
    batches = [int(a) for a in sys.argv[1:]] or [128, 192, 256]

    g = p_attn["ln"]["scale"]
    beta = p_attn["ln"]["bias"]
    v = p_attn["v"]
    # head-major copies of the LN affine + v
    g_h = g.reshape(h, d)
    beta_h = beta.reshape(h, d)
    v_h = v.reshape(h, d)
    temp = p_attn["softmax_temperature"]

    for batch in batches:
        keys_raw = jnp.asarray(
            rng.standard_normal((batch, l, u)), jnp.float32)
        keys = keys_raw.astype(jnp.bfloat16)  # (B, L, U) channel-major
        values = split_heads(keys, h)  # (B, H, L, D)
        keys_h = jnp.asarray(np.transpose(
            np.asarray(keys_raw, np.float32).reshape(batch, l, h, d),
            (0, 2, 1, 3)), jnp.bfloat16)  # (B, H, L, D) head-major
        k32 = keys.astype(jnp.float32)
        key_mean = jnp.mean(k32, axis=-1)  # (B, L)
        key_m2 = jnp.mean(jnp.square(k32), axis=-1)
        query0 = jnp.asarray(
            rng.standard_normal((batch, beam, u)), jnp.float32)

        def step_r4(q):
            """r4 production path: channel-major score + values dot."""
            proj_q = dense_apply(p_attn["query_layer"], q,
                                 dtype=spec.compute_dtype)
            pq = proj_q.astype(keys.dtype)
            q32 = pq.astype(jnp.float32)
            mu_q = jnp.mean(q32, axis=-1)
            m2_q = jnp.mean(jnp.square(q32), axis=-1)
            cross = jnp.einsum("blu,bku->bkl", keys, pq,
                               preferred_element_type=jnp.float32)
            mu = key_mean[:, None, :] + mu_q[:, :, None]
            ex2 = key_m2[:, None, :] + 2.0 * cross / u + m2_q[:, :, None]
            var = jnp.maximum(ex2 - jnp.square(mu), 0.0)
            inv = jax.lax.rsqrt(var + LN_EPS)
            x = keys[:, None].astype(jnp.float32) + q32[:, :, None, :]
            y = jnp.tanh((x - mu[..., None]) * inv[..., None] * g + beta)
            y = y * v
            score = jnp.sum(y.reshape(batch, beam, l, h, d), axis=4)
            score = jnp.transpose(score, (0, 1, 3, 2)) / temp
            al = _probability(acfg, score)
            ctx = jnp.einsum("bkhl,bhld->bkhd",
                             al.astype(values.dtype), values,
                             preferred_element_type=jnp.float32)
            return jnp.tanh(ctx.reshape(batch, beam, -1)).astype(q.dtype)

        def step_hld(q):
            """Unified head-major layout: one loop-invariant buffer."""
            proj_q = dense_apply(p_attn["query_layer"], q,
                                 dtype=spec.compute_dtype)
            pq = proj_q.astype(keys_h.dtype)  # (B, K, U)
            q32 = pq.astype(jnp.float32)
            mu_q = jnp.mean(q32, axis=-1)
            m2_q = jnp.mean(jnp.square(q32), axis=-1)
            pq_h = pq.reshape(batch, beam, h, d)
            cross = jnp.einsum("bhld,bkhd->bkl", keys_h, pq_h,
                               preferred_element_type=jnp.float32)
            mu = key_mean[:, None, :] + mu_q[:, :, None]  # (B, K, L)
            ex2 = key_m2[:, None, :] + 2.0 * cross / u + m2_q[:, :, None]
            var = jnp.maximum(ex2 - jnp.square(mu), 0.0)
            inv = jax.lax.rsqrt(var + LN_EPS)
            # x: (B, K, H, L, D); mu/inv broadcast (B, K, 1, L, 1)
            x = (keys_h[:, None].astype(jnp.float32)
                 + q32.reshape(batch, beam, h, 1, d))
            y = jnp.tanh((x - mu[:, :, None, :, None])
                         * inv[:, :, None, :, None] * g_h[:, None]
                         + beta_h[:, None])
            y = y * v_h[:, None]
            score = jnp.sum(y, axis=4) / temp  # (B, K, H, L) — no transp.
            al = _probability(acfg, score)
            ctx = jnp.einsum("bkhl,bhld->bkhd",
                             al.astype(keys_h.dtype), keys_h,
                             preferred_element_type=jnp.float32)
            return jnp.tanh(ctx.reshape(batch, beam, -1)).astype(q.dtype)

        # numerics check (f32 keys path differs only by bf16 rounding of
        # the transposed copy — compare the two step outputs)
        o1 = np.asarray(jax.jit(step_r4)(query0))
        o2 = np.asarray(jax.jit(step_hld)(query0))
        rel = np.abs(o1 - o2).max() / max(np.abs(o1).max(), 1e-9)

        rows = {}
        for name, body in (("attn_r4", step_r4), ("attn_hld", step_hld)):
            def build(s, body=body):
                def run(q):
                    q, _ = jax.lax.scan(lambda c, _: (body(c), ()),
                                        q, None, length=s)
                    return q
                return jax.jit(run), (query0,)

            us = _slope_us_per_step(build, lengths=(16, 128))
            rows[name] = us
        print(f"b{batch:<4} attn_r4 {rows['attn_r4']:7.1f} us/step   "
              f"attn_hld {rows['attn_hld']:7.1f} us/step   "
              f"rel_diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
