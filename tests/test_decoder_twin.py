"""Decoder TF-twin golden: the full wrapper step through raw tf ops.

An independent TensorFlow re-implementation (raw tf.* math, no contrib, no
shared code with comic_tpu) of the reference decoder step
(/root/reference/common/ops_rnn.py:660-755 MultiHeadAttentionWrapperV3.call:
concat(word_emb, prev-attention) -> BasicLSTM -> MultiHeadAddLN
(ops_rnn.py:523-565) -> output projection), run teacher-forced and greedy,
compared against comic_tpu's models/decoder.py with SHARED weights.

The weights flow through the reference-checkpoint converter on the JAX
side while the twin reads the same TF checkpoint by reference variable
names — so this test validates both the converter's semantic mapping
(gate order, kernel layouts, LN param naming) and the decoder math
(including the closed-form-LN fast path) against an independent
implementation. Decoder analogue of tests/test_composed_goldens.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comic_tpu.configuration import Config
from comic_tpu.decoding.search import greedy_or_sample_from_memory
from comic_tpu.models.attention import precompute
from comic_tpu.models.captioner import build_model_spec, init_params
from comic_tpu.models.decoder import teacher_forced
from comic_tpu.training import checkpoints as ckpt
from comic_tpu.utils import tf_checkpoint as tfc

from test_reference_ckpt import RNN_DEC, WRAP, _manufacture, _vocab

tf = pytest.importorskip("tensorflow")

B, L, T = 3, 10, 6
C, E = 832, 1024  # inception_v1 Mixed_4f channels / pooled feature dim


def _twin_weights(ckpt_path):
    """Read decoder weights from the checkpoint by REFERENCE names."""
    reader = tf.train.load_checkpoint(ckpt_path)
    g = reader.get_tensor
    return {
        "embedding": g(f"{RNN_DEC}/embedding_map"),
        "w_out": g(f"{RNN_DEC}/output_projection/kernel"),
        "b_out": g(f"{RNN_DEC}/output_projection/bias"),
        "w_mem": g(f"{RNN_DEC}/memory_layer/kernel"),
        "w_query": g(f"{WRAP}/multi_add_attention/query_layer/kernel"),
        "v": g(f"{WRAP}/multi_add_attention/attention_v"),
        "ln_gamma": g(f"{WRAP}/multi_add_attention/LN_tanh/gamma"),
        "ln_beta": g(f"{WRAP}/multi_add_attention/LN_tanh/beta"),
        "temperature": g(f"{WRAP}/softmax_temperature"),
        "w_proj": g(f"{RNN_DEC}/rnn_init_input/projection/weight"),
        "lstm_kernel": g(f"{RNN_DEC}/rnn_init_input/basic_lstm_cell/kernel"),
        "lstm_bias": g(f"{RNN_DEC}/rnn_init_input/basic_lstm_cell/bias"),
    }


def _twin_lstm(w, x, c, h):
    """BasicLSTMCell math (contrib rnn, gate order i,j,f,o, forget bias 1)."""
    gates = tf.matmul(tf.concat([x, h], axis=-1), w["lstm_kernel"]) \
        + w["lstm_bias"]
    i, j, f, o = tf.split(gates, 4, axis=-1)
    new_c = c * tf.sigmoid(f + 1.0) + tf.sigmoid(i) * tf.tanh(j)
    new_h = tf.tanh(new_c) * tf.sigmoid(o)
    return new_c, new_h


def _twin_attention(w, heads, probability, keys, values_split, h):
    """MultiHeadAddLN scoring + context (ops_rnn.py:523-565, 703-716)."""
    proj_q = tf.matmul(h, w["w_query"])[:, None, :]  # (B, 1, U)
    s = keys + proj_q  # (B, L, U)
    mu = tf.reduce_mean(s, axis=-1, keepdims=True)
    var = tf.reduce_mean(tf.square(s - mu), axis=-1, keepdims=True)
    s = (s - mu) / tf.sqrt(var + 1e-12) * w["ln_gamma"] + w["ln_beta"]
    s = tf.tanh(s) * w["v"]
    b, l, u = s.shape
    s = tf.reduce_sum(tf.reshape(s, (b, l, heads, u // heads)), axis=3)
    score = tf.transpose(s, (0, 2, 1)) / w["temperature"]  # (B, H, L)
    if probability == "softmax":
        align = tf.nn.softmax(score, axis=-1)
    else:  # normalized sigmoid _signorm (model_base.py:598-603)
        align = tf.sigmoid(score)
        align = align / tf.reduce_sum(align, axis=-1, keepdims=True)
    # context_h = align_h @ values_h, heads recombined
    ctx = tf.matmul(align[:, :, None, :], values_split)  # (B, H, 1, D)
    ctx = tf.reshape(tf.transpose(ctx, (0, 2, 1, 3)), (b, -1))  # (B, U)
    return align, ctx


def _twin_setup(w, heads, im_embed, fmaps):
    keys = tf.einsum("blc,cu->blu", tf.constant(fmaps),
                     tf.constant(w["w_mem"]))
    b, l, u = keys.shape
    values_split = tf.transpose(
        tf.reshape(keys, (b, l, heads, u // heads)), (0, 2, 1, 3))
    # first_input init (model_base.py:673-685)
    x0 = tf.matmul(tf.constant(im_embed), w["w_proj"])
    rnn = int(w["lstm_bias"].shape[0]) // 4
    c = h = tf.zeros((b, rnn), tf.float32)
    c, h = _twin_lstm(w, x0, c, h)
    return keys, values_split, c, h


def _twin_teacher_forced(w, heads, probability, inputs, im_embed, fmaps):
    keys, values_split, c, h = _twin_setup(w, heads, im_embed, fmaps)
    softmax_size = w["embedding"].shape[0]
    emb = tf.matmul(
        tf.reshape(tf.one_hot(inputs, softmax_size), (-1, softmax_size)),
        w["embedding"])
    emb = tf.reshape(emb, (inputs.shape[0], inputs.shape[1], -1))
    attn = tf.zeros((inputs.shape[0], int(w["w_query"].shape[1])))
    logits_t, align_t = [], []
    for t in range(inputs.shape[1]):
        x = tf.concat([emb[:, t], attn], axis=-1)
        c, h = _twin_lstm(w, x, c, h)
        align, attn = _twin_attention(w, heads, probability, keys,
                                      values_split, h)
        logits_t.append(tf.matmul(h, w["w_out"]) + w["b_out"])
        align_t.append(align)
    return (tf.stack(logits_t, axis=1).numpy(),       # (B, T, S)
            tf.stack(align_t, axis=1).numpy())        # (B, T, H, L)


def _twin_greedy(w, heads, probability, start_id, end_id, max_steps,
                 im_embed, fmaps):
    keys, values_split, c, h = _twin_setup(w, heads, im_embed, fmaps)
    softmax_size = w["embedding"].shape[0]
    b = im_embed.shape[0]
    attn = tf.zeros((b, int(w["w_query"].shape[1])))
    prev = np.full((b,), start_id, np.int32)
    finished = np.zeros((b,), bool)
    out, aligns = [], []
    for _ in range(max_steps):
        emb = tf.matmul(tf.one_hot(prev, softmax_size), w["embedding"])
        x = tf.concat([emb, attn], axis=-1)
        c, h = _twin_lstm(w, x, c, h)
        align, attn = _twin_attention(w, heads, probability, keys,
                                      values_split, h)
        # zero maps of already-finished rows, like the jax scan output
        aligns.append(align.numpy() * ~finished[:, None, None])
        logits = (tf.matmul(h, w["w_out"]) + w["b_out"]).numpy()
        nxt = np.argmax(logits, axis=-1).astype(np.int32)
        out.append(np.where(finished, -1, nxt))
        finished = finished | (nxt == end_id)
        prev = nxt
    # ids (B, T); aligns stacked to the reference (B, H, T, L) layout
    return np.stack(out, axis=1), np.stack(aligns, axis=2)


@pytest.mark.parametrize("probability", ["softmax", "sigmoid"])
def test_decoder_twin_teacher_forced_and_greedy(rng, tmp_path, probability):
    config = Config(token_type="radix", radix_base=32, rnn_size=64,
                    rnn_word_size=16, attn_num_heads=4,
                    attn_probability_fn=probability,
                    compute_dtype="float32")
    _, path, template, spec, vocab = _manufacture(config, rng, tmp_path,
                                                  plant_junk=False)
    out = tfc.convert_reference_checkpoint(path, config, vocab)
    params, _, _, mode = ckpt.restore_model(template, out)
    assert mode == "model"
    w = _twin_weights(path)
    heads = config.attn_num_heads

    im_embed = rng.standard_normal((B, E)).astype(np.float32)
    fmaps = rng.standard_normal((B, L, C)).astype(np.float32)
    # token inputs with trailing PAD (-1) rows like a real bucket batch
    inputs = rng.integers(0, 32, (B, T)).astype(np.int32)
    inputs[1, -2:] = -1

    # --- teacher-forced ---
    logits, aligns = teacher_forced(
        params["decoder"], spec.decoder, jnp.asarray(inputs),
        jnp.asarray(im_embed), jnp.asarray(fmaps), training=False)
    t_logits, t_aligns = _twin_teacher_forced(
        w, heads, probability, tf.constant(inputs), im_embed, fmaps)
    np.testing.assert_allclose(np.asarray(logits), t_logits,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(aligns), t_aligns,
                               rtol=1e-4, atol=1e-5)

    # --- greedy decode ---
    memory = precompute(params["decoder"]["attention"],
                        spec.decoder.attention, jnp.asarray(fmaps))
    dec = greedy_or_sample_from_memory(
        params["decoder"], spec, jnp.asarray(im_embed), memory,
        max_steps=12)
    t_ids, t_aligns = _twin_greedy(w, heads, probability,
                                   spec.decoder.start_id,
                                   spec.decoder.end_id, 12, im_embed, fmaps)
    np.testing.assert_array_equal(np.asarray(dec.ids), t_ids)
    np.testing.assert_allclose(np.asarray(dec.alignments), t_aligns,
                               rtol=1e-4, atol=1e-5)
