"""Decode-step section budget + empirical VPU ceiling (VERDICT r4 #2).

Times, at the exact b128/beam-3 serving shapes (rows=384, L=196, U=512,
H=8, bf16 keys), each section of the decode step as a bare scanned
program, using the two-length slope methodology (bench._slope_us_per_step)
that cancels the ~3.8 ms tunnel dispatch floor exactly:

  mul_chain     x*a+b on the (384,196,512) volume — cheap-op VPU ceiling
  tanh_chain    add -> tanh -> reduce (the minimal add_LN-shaped sweep)
  fastln        the production _add_ln_scores_fast score chain alone
  fastln_sm     + softmax (_probability)
  attn_full     full attend_grouped (score + softmax + context einsum)
  ctx_bhld      context einsum alone, current layout (values (B,H,L,D))
  ctx_blhd      context einsum DIRECTLY on the keys buffer ((B,L,H,D)
                reshape view) — tied projection only: values = split_heads
                (keys), so this avoids materializing/streaming a second
                25.7 MB loop-invariant buffer entirely
  ctx_vpu       context as explicit mul + L-reduce (VPU formulation)

Run: python tools/vpu_peak.py   (real TPU; ~15 min of compiles)

Measured 2026-08-19, two independent runs (TPU v5e via axon tunnel,
COMIC-256 shapes, b128; sub-100 us probes carry +-40 us slope noise from
tunnel-latency jitter over the 48-step length delta, so read the big
probes, which are stable to a few %):

  mul_chain      40.0 us/step   4830 Gelem/s  cheap-op ceiling (2x
                                fused multiply-add over the volume)
  tanh_chain    29.5 / 35.5     2184-2626 Gelem/s (tanh ~ 2x a mul)
  fastln       121.4 / 121.5    2240 Gelem/s roofline-counted
  fastln_sm    131.9 / 128.1    (softmax adds ~7-10 us)
  attn_full    163.1 / 169.0    full attend_grouped with materialized
                                (B,H,L,D) values (the r4 layout)
  attn_blhd         150.7       full step, context contracted against
                                the keys (B,L,H,D) reshape view
  ctx_bhld     114.9 / noise    context einsum standalone, (B,H,L,D)
  ctx_blhd      40.5 / noise    keys-view standalone: ~2.8x faster
  ctx_vpu      unstable         explicit mul+reduce formulation

  (tools/batch_sweep.py's attn_only 229 us at b128 = attn_full + the
  ~63 us/step dispatch-floor share its scan/60 methodology includes;
  the slope method here cancels dispatch exactly.)

Conclusions:
  - the closed-form score chain runs at 2240 Gelem/s vs the 2184-2626
    bare tanh-chain rate at the same shapes -- ~85-100% of the empirical
    elementwise ceiling. The r4 "at the VPU floor" claim is now a
    MEASUREMENT; score-chain work is certified closed.
  - the keys-view context contraction (einsum "bkhl,blhd->bkhd", tied
    projection: values = split_heads(keys)) looked like a win in
    ISOLATION -- ~2.8x faster standalone, ~15 us/step inside the bare
    attention step -- because this probe's keys buffer arrives at
    program entry in whatever layout XLA picks per-program. Inside the
    REAL 60-step decode scan it is a measured REGRESSION: the MXU needs
    an (l: d)-minor operand, so XLA materializes the transposed copy
    anyway; keys + transposed copy hit the same 51.4 MB and the b128
    point SPILLS (serve 23.1 -> 29.4 ms, attn 229 -> 334 us/step,
    tools/batch_sweep.py re-run 2026-08-19). NOT adopted; the
    production path keeps the precomputed (B,H,L,D) values tensor.
    The unified head-major layout (score chain run from (B,H,L,D) too,
    single buffer) is also slower -- see tools/attn_layout_probe.py.
  - net: every section of the decode attention step is now measured at
    or above ~85% of a bare same-shaped chain; with both layout
    alternatives measured worse end-to-end, the step is certified at
    the chip's empirical floor for this op mix.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bench import _slope_us_per_step, real_vocab
    from comic_tpu.models.attention import (_add_ln_scores_fast,
                                            _probability, attend_grouped,
                                            precompute)
    from comic_tpu.models.captioner import build_model_spec
    from comic_tpu.models.layers import dense_apply
    from comic_tpu.utils.roofline import count_costs

    config, spec, params = _flagship()
    vocab = real_vocab()
    spec = build_model_spec(config, vocab)
    beam = int(config.infer_beam_size)
    batch = 128
    rows = batch * beam
    acfg = spec.decoder.attention
    l, u, h = 196, acfg.num_units, acfg.num_heads
    d = u // h
    rng = np.random.default_rng(7)

    p_attn = params["decoder"]["attention"]
    c_in = p_attn["memory_layer"]["kernel"].shape[0]
    fmaps = jnp.asarray(rng.standard_normal((batch, l, c_in)), jnp.float32)
    memory = precompute(p_attn, acfg, fmaps, dtype=spec.compute_dtype)
    keys_bf = memory.keys  # (B, L, U) bf16
    values = memory.values  # (B, H, L, D)

    flat = jnp.asarray(rng.standard_normal((rows, l, u)), jnp.bfloat16)
    coefs = (jnp.bfloat16(1.0001), jnp.bfloat16(0.0001))
    q0 = jnp.asarray(rng.standard_normal((rows, u)), jnp.float32)
    pq0 = jnp.asarray(rng.standard_normal((batch, beam, u)), jnp.float32)
    query0 = jnp.asarray(rng.standard_normal((batch, beam, u)), jnp.float32)
    align0 = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((batch, beam, h, l)), jnp.float32))

    def scan_probe(name, body, carry0):
        def build(s):
            def run(carry):
                carry, _ = jax.lax.scan(lambda c, _: (body(c), ()),
                                        carry, None, length=s)
                return carry
            return jax.jit(run), (carry0,)

        us = _slope_us_per_step(build)
        cost = count_costs(body, carry0)
        gel = cost.vpu_elems / (us * 1e-6) / 1e9 if us > 0 else 0
        print(f"{name:<12} {us:8.1f} us/step  {gel:8.0f} Gelem/s  "
              f"(counted {cost.vpu_elems/1e6:.1f} Melem, "
              f"{cost.mxu_flops/1e6:.0f} MFLOP)", flush=True)
        return us

    # cheap-op ceiling: K fused multiply-adds over the grouped score
    # volume, keys loop-invariant (a big CARRY would be copied every scan
    # step — 77 MB carry measured 4.4 ms/step — so the volume must come
    # from the closed-over invariant, like the real decode)
    def mul_body(q):
        y = (keys_bf[:, None] + q.reshape(batch, beam, 1, u)
             .astype(keys_bf.dtype))
        y = y * coefs[0] + coefs[1]
        y = y * coefs[0] + coefs[1]
        return jnp.mean(y.astype(jnp.float32), axis=2).reshape(rows, u)
    scan_probe("mul_chain", mul_body, q0)

    # tanh-shaped minimal chain at the GROUPED shapes (per-image keys
    # broadcast over K beams — the flat (rows, L, U) variant reads a
    # 77 MB buffer that cannot be VMEM-resident and measures HBM, not
    # the VPU)
    def tanh_body(q):
        y = jnp.tanh(keys_bf[:, None] + q.reshape(batch, beam, 1, u)
                     .astype(keys_bf.dtype))
        return jnp.mean(y.astype(jnp.float32), axis=2).reshape(rows, u)
    scan_probe("tanh_chain", tanh_body, q0)

    # production score chain, then +softmax
    def fastln_body(pq):
        score = _add_ln_scores_fast(p_attn, acfg, memory,
                                    pq.astype(keys_bf.dtype))
        return pq + jnp.sum(score, axis=(2, 3))[..., None] * 1e-6
    scan_probe("fastln", fastln_body, pq0)

    def fastln_sm_body(pq):
        score = _add_ln_scores_fast(p_attn, acfg, memory,
                                    pq.astype(keys_bf.dtype))
        al = _probability(acfg, score)
        return pq + jnp.sum(al, axis=(2, 3))[..., None] * 1e-6
    scan_probe("fastln_sm", fastln_sm_body, pq0)

    # full production attention step
    def attn_body(q):
        ctx, _ = attend_grouped(p_attn, acfg, q, memory,
                                dtype=spec.compute_dtype)
        return jnp.tanh(ctx).astype(q.dtype)
    scan_probe("attn_full", attn_body, query0)

    # context einsum variants (alignments carried, trivially perturbed)
    def ctx_bhld(al):
        ctx = jnp.einsum("bkhl,bhld->bkhd", al.astype(values.dtype),
                         values, preferred_element_type=jnp.float32)
        return al + jnp.sum(ctx, axis=3)[..., None] * 1e-6

    keys_view = keys_bf.reshape(batch, l, h, d)

    def ctx_blhd(al):
        ctx = jnp.einsum("bkhl,blhd->bkhd", al.astype(keys_bf.dtype),
                         keys_view, preferred_element_type=jnp.float32)
        return al + jnp.sum(ctx, axis=3)[..., None] * 1e-6

    def ctx_vpu(al):
        # al (B,K,H,L,1) * values (B,1,H,L,D) -> sum over L
        prod = (al.astype(jnp.float32)[..., None]
                * values[:, None].astype(jnp.float32))
        ctx = jnp.sum(prod, axis=3)
        return al + jnp.sum(ctx, axis=3)[..., None] * 1e-6

    scan_probe("ctx_bhld", ctx_bhld, align0)
    scan_probe("ctx_blhd", ctx_blhd, align0)
    scan_probe("ctx_vpu", ctx_vpu, align0)

    # full attention step with the context einsum reading the keys view
    # (what the tied-projection fast path in models/attention.py does)
    def attn_blhd_body(q):
        proj_q = dense_apply(p_attn["query_layer"], q,
                             dtype=spec.compute_dtype)
        score = _add_ln_scores_fast(p_attn, acfg, memory,
                                    proj_q.astype(keys_bf.dtype))
        al = _probability(acfg, score)
        ctx = jnp.einsum("bkhl,blhd->bkhd", al.astype(keys_bf.dtype),
                         keys_view, preferred_element_type=jnp.float32)
        ctx = ctx.reshape(batch, beam, -1)
        return jnp.tanh(ctx).astype(q.dtype)
    scan_probe("attn_blhd", attn_blhd_body, query0)

    # query projection (MXU sanity)
    def qproj_body(q):
        pq = dense_apply(p_attn["query_layer"], q,
                         dtype=spec.compute_dtype)
        return q + pq.astype(q.dtype) * 1e-6
    scan_probe("q_proj", qproj_body, query0)


if __name__ == "__main__":
    main()
