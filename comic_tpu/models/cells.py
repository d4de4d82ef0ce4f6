"""Recurrent cells as pure step functions.

Functional equivalents of the reference's cell zoo
(/root/reference/src/model_base.py:606-648): BasicLSTMCell,
LayerNormBasicLSTMCell, GRUCell, plus input/output dropout. State is a small
pytree; the step is designed to live inside `lax.scan` / `lax.while_loop`
bodies, with the gate matmul fused into a single (in+hidden, 4*hidden)
product for the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import layer_norm_apply, layer_norm_init, xavier_uniform

Params = Dict[str, Any]


class LSTMState(NamedTuple):
    c: jnp.ndarray
    h: jnp.ndarray


# --- LSTM (tf BasicLSTMCell: gate order i, j, f, o; forget_bias=1.0) -------

def lstm_init(key, input_size: int, num_units: int, init=xavier_uniform) -> Params:
    return {
        "kernel": init(key, (input_size + num_units, 4 * num_units)),
        "bias": jnp.zeros((4 * num_units,), jnp.float32),
    }


def lstm_step(p: Params, x: jnp.ndarray, state: LSTMState,
              forget_bias: float = 1.0, dtype=None) -> Tuple[jnp.ndarray, LSTMState]:
    xc = jnp.concatenate([x, state.h], axis=-1)
    k = p["kernel"]
    if dtype is not None:
        xc, k = xc.astype(dtype), k.astype(dtype)
    gates = jnp.matmul(xc, k, preferred_element_type=jnp.float32) + p["bias"]
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = state.c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_h, LSTMState(new_c, new_h)


# --- LayerNorm LSTM (tf LayerNormBasicLSTMCell) ----------------------------

def ln_lstm_init(key, input_size: int, num_units: int, init=xavier_uniform) -> Params:
    return {
        "kernel": init(key, (input_size + num_units, 4 * num_units)),
        # per-gate layer norms + cell-state norm, like the contrib cell
        "ln_i": layer_norm_init(num_units),
        "ln_j": layer_norm_init(num_units),
        "ln_f": layer_norm_init(num_units),
        "ln_o": layer_norm_init(num_units),
        "ln_c": layer_norm_init(num_units),
    }


def ln_lstm_step(p: Params, x: jnp.ndarray, state: LSTMState,
                 forget_bias: float = 1.0, dtype=None) -> Tuple[jnp.ndarray, LSTMState]:
    xc = jnp.concatenate([x, state.h], axis=-1)
    k = p["kernel"]
    if dtype is not None:
        xc, k = xc.astype(dtype), k.astype(dtype)
    gates = jnp.matmul(xc, k, preferred_element_type=jnp.float32)
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    i = layer_norm_apply(p["ln_i"], i)
    j = layer_norm_apply(p["ln_j"], j)
    f = layer_norm_apply(p["ln_f"], f)
    o = layer_norm_apply(p["ln_o"], o)
    new_c = state.c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(layer_norm_apply(p["ln_c"], new_c)) * jax.nn.sigmoid(o)
    return new_h, LSTMState(new_c, new_h)


# --- GRU (tf GRUCell: gate bias init 1.0) ----------------------------------

def gru_init(key, input_size: int, num_units: int, init=xavier_uniform) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "gate_kernel": init(k1, (input_size + num_units, 2 * num_units)),
        "gate_bias": jnp.ones((2 * num_units,), jnp.float32),
        "cand_kernel": init(k2, (input_size + num_units, num_units)),
        "cand_bias": jnp.zeros((num_units,), jnp.float32),
    }


def gru_step(p: Params, x: jnp.ndarray, h: jnp.ndarray,
             dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    xc = jnp.concatenate([x, h], axis=-1)
    gk = p["gate_kernel"]
    if dtype is not None:
        xc, gk = xc.astype(dtype), gk.astype(dtype)
    gates = jax.nn.sigmoid(
        jnp.matmul(xc, gk, preferred_element_type=jnp.float32) + p["gate_bias"])
    r, u = jnp.split(gates, 2, axis=-1)
    xrh = jnp.concatenate([x, r * h], axis=-1)
    ck = p["cand_kernel"]
    if dtype is not None:
        xrh, ck = xrh.astype(dtype), ck.astype(dtype)
    c = jnp.tanh(
        jnp.matmul(xrh, ck, preferred_element_type=jnp.float32) + p["cand_bias"])
    new_h = u * h + (1.0 - u) * c
    return new_h, new_h


# --- cell registry ---------------------------------------------------------

class Cell:
    """Bundles init/step/zero-state for a named cell type.

    `state` pytrees: LSTMState(c, h) for LSTM variants; bare array for GRU.
    """

    def __init__(self, name: str, input_size: int, num_units: int):
        if name not in ("LSTM", "LN_LSTM", "GRU"):
            raise ValueError("Only `LSTM`, `LN_LSTM` and `GRU` are accepted.")
        self.name = name
        self.input_size = input_size
        self.num_units = num_units

    def init(self, key, init=xavier_uniform) -> Params:
        if self.name == "LSTM":
            return lstm_init(key, self.input_size, self.num_units, init)
        if self.name == "LN_LSTM":
            return ln_lstm_init(key, self.input_size, self.num_units, init)
        return gru_init(key, self.input_size, self.num_units, init)

    def zero_state(self, batch_size: int, dtype=jnp.float32):
        z = jnp.zeros((batch_size, self.num_units), dtype)
        if self.name == "GRU":
            return z
        return LSTMState(z, z)

    def step(self, p: Params, x, state, dtype=None):
        if self.name == "LSTM":
            return lstm_step(p, x, state, dtype=dtype)
        if self.name == "LN_LSTM":
            return ln_lstm_step(p, x, state, dtype=dtype)
        return gru_step(p, x, state, dtype=dtype)

    def state_from_hidden(self, h: jnp.ndarray):
        """`project_hidden` init: h projected, c zeroed (model_base.py:657-672)."""
        if self.name == "GRU":
            return h
        return LSTMState(jnp.zeros_like(h), h)


def apply_dropout(key: Optional[jax.Array], x: jnp.ndarray, keep_prob: float,
                  deterministic: bool, noise: Optional[jnp.ndarray] = None):
    """Inverted dropout matching tf DropoutWrapper semantics.

    `noise` supplies a fixed mask for variational recurrent dropout
    (same mask at every time step, model_base.py:641-647).
    """
    if deterministic or keep_prob >= 1.0:
        return x
    if noise is not None:
        return x * noise
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)
