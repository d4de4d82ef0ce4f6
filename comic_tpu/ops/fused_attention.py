"""Pallas TPU kernel: fused multi-head add_LN attention decode step.

The per-token attention step (SURVEY.md §3.4) is the decode-phase
bottleneck: the jnp formulation materializes several (rows, L, U) f32
intermediates per step (add -> layer-norm -> tanh -> v-dot -> softmax ->
context), making it ~2x memory-bound over the minimum. This kernel computes
the whole chain in VMEM with ONE pass over the keys:

    s    = LN(keys + q) (stats over U) * ln_scale + ln_bias
    e_h  = sum_d tanh(s)[:, :, hD:(h+1)D] * v[hD:(h+1)D]
    a_h  = softmax(e_h / temperature)      (over the L positions)
    ctx  = concat_h sum_l a_h[l] * keys[:, l, hD:(h+1)D]   (tied values)

For the COMIC default ('tied' feature-map projection) values ARE the keys
(ops_rnn.py:460-470), so context needs no second memory read. Each grid
program handles an 8-row tile of the (batch x beam) dimension; keys stream
HBM->VMEM exactly once per decode step.

Numerics: keys may be stored bfloat16; all arithmetic runs in f32 in VMEM.

** MEASURED NEGATIVE RESULT — NOT wired into the decode path. ** This flat
(beam-tiled) variant reads keys once per HYPOTHESIS; the beam-grouped
successor (ops/grouped_attention.py) reads them once per IMAGE and still
loses to the XLA closed-form route by ~40% at the flagship decode shapes —
see grouped_attention.py's docstring for the measured table and analysis.
Both kernels are kept as documented, numerics-tested experiments.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-12
ROW_TILE = 8


def _kernel(q_ref, keys_ref, v_ref, ln_scale_ref, ln_bias_ref, temp_ref,
            ctx_ref, align_ref, *, num_heads: int):
    keys = keys_ref[...].astype(jnp.float32)  # (TR, L, U)
    tr, mem_len, units = keys.shape
    d = units // num_heads
    q = q_ref[...].astype(jnp.float32)  # (TR, U)

    s = keys + q[:, None, :]
    mean = jnp.mean(s, axis=2, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=2, keepdims=True)
    s = (s - mean) * jax.lax.rsqrt(var + LN_EPS)
    s = s * ln_scale_ref[...] + ln_bias_ref[...]
    s = jnp.tanh(s) * v_ref[...]  # (TR, L, U)

    inv_temp = 1.0 / temp_ref[0, 0]
    for h in range(num_heads):
        e = jnp.sum(s[:, :, h * d:(h + 1) * d], axis=2) * inv_temp  # (TR, L)
        e = e - jnp.max(e, axis=1, keepdims=True)
        w = jnp.exp(e)
        a = w / jnp.sum(w, axis=1, keepdims=True)  # (TR, L)
        align_ref[:, h, :] = a
        ctx_ref[:, h * d:(h + 1) * d] = jnp.sum(
            keys[:, :, h * d:(h + 1) * d] * a[:, :, None], axis=1)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_add_ln_attention(
    query: jnp.ndarray,  # (R, U)
    keys: jnp.ndarray,  # (R, L, U) — tied: values == keys
    v: jnp.ndarray,  # (U,)
    ln_scale: jnp.ndarray,  # (U,)
    ln_bias: jnp.ndarray,  # (U,)
    temperature: jnp.ndarray,  # scalar
    *, num_heads: int, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (context (R, U) f32, alignments (R, H, L) f32)."""
    rows, mem_len, units = keys.shape
    if units % num_heads != 0:
        raise ValueError("units must divide num_heads")

    pad = (-rows) % ROW_TILE
    if pad:
        query = jnp.pad(query, ((0, pad), (0, 0)))
        keys = jnp.pad(keys, ((0, pad), (0, 0), (0, 0)))
    padded_rows = rows + pad

    kern = functools.partial(_kernel, num_heads=num_heads)
    ctx, align = pl.pallas_call(
        kern,
        grid=(padded_rows // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, units), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, mem_len, units), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, units), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, units), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, units), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, units), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, num_heads, mem_len), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((padded_rows, units), jnp.float32),
            jax.ShapeDtypeStruct((padded_rows, num_heads, mem_len),
                                 jnp.float32),
        ),
        interpret=interpret,
    )(query, keys, v.reshape(1, -1), ln_scale.reshape(1, -1),
      ln_bias.reshape(1, -1),
      jnp.asarray(temperature, jnp.float32).reshape(1, 1))
    if pad:
        ctx, align = ctx[:rows], align[:rows]
    return ctx, align
