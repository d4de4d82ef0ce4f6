"""Pallas TPU kernel: beam-grouped fused add_LN attention decode step.

** MEASURED NEGATIVE RESULT — kept as the documented experiment; the decode
path uses the XLA closed-form route (attention._add_ln_scores_fast). **

One grid program per image fuses the whole per-step attention chain for all
K beam hypotheses sharing that image's memory:

    s_k   = tanh((keys + q_k - mu_k) * inv_k * ln_scale + ln_bias) * v
    e_k   = s_k @ Hsel / temperature                          MXU (L, H)
    a_k   = softmax(e_k, axis=L)
    cf_k  = a_k^T @ keys                                      MXU (H, U)
    ctx_k = concat_h cf_k[h, hD:(h+1)D]                       (tied values)

with LN statistics precomputed in closed form outside (cheap XLA einsum;
shipped (B, L, K) sublane-major so the kernel broadcasts with no relayout)
and Hsel a block-diagonal head selector so the per-head channel reductions
run on the MXU. Keys stream HBM->VMEM exactly ONCE per image per step vs
~3 reads for the XLA path.

Measured on TPU v5e at the flagship decode point (B=128, K=3, L=196,
U=512, H=8, bf16 keys, 60-step scan, batch mean of 20 runs):

    XLA closed-form path (attention.py)          ~202 us/step
    this kernel, in-VMEM two-pass LN stats        ~278 us/step
    this kernel, closed-form stats (this file)    ~290 us/step
    lane-sliced VPU head sums instead of MXU      ~691 us/step

The op is VPU/codegen-bound, not HBM-bound: the 3x keys-read saving
(~60 us/step at 819 GB/s) is smaller than Mosaic's codegen gap vs XLA's
fusion on the tanh chain, and the (L, 8)-shaped dots pad the MXU 16x.
Conclusion: XLA's fusion of the restructured math IS the fast kernel; a
hand-written Pallas step does not pay off at these shapes.

Tied feature-map projection only (values ARE keys, ops_rnn.py:460-470).
Numerics match attend_grouped to ~1e-7 (interpreter-mode test in
tests/test_ops.py). Reference semantics: ops_rnn.py:523-565
(MultiHeadAddLN), model_base.py:598-613.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-12


def _kernel(q_ref, keys_ref, mu_ref, inv_ref, v_ref, hsel_ref, ln_scale_ref,
            ln_bias_ref, temp_ref, ctx_ref, align_ref, *, num_beams: int,
            num_heads: int):
    keys = keys_ref[0].astype(jnp.float32)  # (L, U)
    mem_len, units = keys.shape
    d = units // num_heads
    q_all = q_ref[0].astype(jnp.float32)  # (K, U)
    mu_all = mu_ref[0]  # (L, K) — sublane-major, broadcasts over U for free
    inv_all = inv_ref[0]  # (L, K)
    v = v_ref[...].astype(jnp.float32)  # (1, U)
    ln_scale = ln_scale_ref[...]  # (1, U)
    ln_bias = ln_bias_ref[...]
    inv_temp = 1.0 / temp_ref[0, 0]

    for k in range(num_beams):  # K is tiny (3/7); unrolled
        q = q_all[k]  # (U,)
        # ONE elementwise pass over (L, U): normalize + affine + tanh;
        # the LN statistics come precomputed (closed form, see
        # attention._add_ln_scores_fast) in (L, 1) sublane layout
        t = (keys + q[None, :] - mu_all[:, k:k + 1]) * inv_all[:, k:k + 1]
        s = jnp.tanh(t * ln_scale + ln_bias) * v  # (L, U), v folded in
        # per-head channel reductions on the MXU via a block-diagonal
        # head-selector matrix (lane-sliced VPU sums measured 2.4x worse)
        e = jnp.dot(s, hsel_ref[...],
                    preferred_element_type=jnp.float32) * inv_temp  # (L, H)
        e = e - jnp.max(e, axis=0, keepdims=True)
        w = jnp.exp(e)
        a = w / jnp.sum(w, axis=0, keepdims=True)  # (L, H) softmax over L
        align_ref[0, k, :, :] = a.T
        cf = jnp.dot(a.T, keys, preferred_element_type=jnp.float32)  # (H, U)
        for h in range(num_heads):
            ctx_ref[0, k, h * d:(h + 1) * d] = cf[h, h * d:(h + 1) * d]


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def grouped_add_ln_attention(
    query: jnp.ndarray,  # (B, K, U) projected queries
    keys: jnp.ndarray,  # (B, L, U) UNtiled per-image keys (== tied values)
    key_mean: jnp.ndarray,  # (B, L) f32 per-position key channel mean
    key_m2: jnp.ndarray,  # (B, L) f32 per-position mean of squared keys
    v: jnp.ndarray,  # (U,)
    ln_scale: jnp.ndarray,  # (U,)
    ln_bias: jnp.ndarray,  # (U,)
    temperature: jnp.ndarray,  # scalar
    *, num_heads: int, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (context (B, K, U) f32, alignments (B, K, H, L) f32)."""
    batch, num_beams, units = query.shape
    mem_len = keys.shape[1]
    if units % num_heads != 0:
        raise ValueError("units must divide num_heads")
    d = units // num_heads

    # closed-form LN statistics OUTSIDE the kernel (XLA does the tiny
    # cross-term einsum + moment math efficiently); shipped (B, L, K)
    # sublane-major so the kernel broadcasts them over U with no relayout
    q32 = query.astype(jnp.float32)
    mu_q = jnp.mean(q32, axis=-1)  # (B, K)
    m2_q = jnp.mean(jnp.square(q32), axis=-1)
    cross = jnp.einsum("blu,bku->bkl", keys, query.astype(keys.dtype),
                       preferred_element_type=jnp.float32)  # (B, K, L)
    mu = key_mean[:, None, :] + mu_q[:, :, None]  # (B, K, L)
    ex2 = key_m2[:, None, :] + 2.0 * cross / units + m2_q[:, :, None]
    inv = jax.lax.rsqrt(jnp.maximum(ex2 - jnp.square(mu), 0.0) + LN_EPS)
    mu_t = jnp.transpose(mu, (0, 2, 1))  # (B, L, K)
    inv_t = jnp.transpose(inv, (0, 2, 1))

    # block-diagonal head-selector for the per-head channel sums
    head_of = jnp.arange(units) // d  # (U,)
    hsel = (head_of[:, None] == jnp.arange(num_heads)[None, :]
            ).astype(jnp.float32)  # (U, H)

    kern = functools.partial(_kernel, num_beams=num_beams,
                             num_heads=num_heads)
    ctx, align = pl.pallas_call(
        kern,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, num_beams, units), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mem_len, units), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mem_len, num_beams), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mem_len, num_beams), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, units), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((units, num_heads), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, units), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, units), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, num_beams, units), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_beams, num_heads, mem_len),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, num_beams, units), jnp.float32),
            jax.ShapeDtypeStruct((batch, num_beams, num_heads, mem_len),
                                 jnp.float32),
        ),
        interpret=interpret,
    )(query, keys, mu_t, inv_t, v.reshape(1, -1), hsel,
      ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
      jnp.asarray(temperature, jnp.float32).reshape(1, 1))
    return ctx, align
