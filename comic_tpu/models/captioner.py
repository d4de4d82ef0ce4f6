"""The full caption model: encoder + attention decoder + losses.

Functional equivalent of CaptionModel / ModelBase
(/root/reference/src/model.py:21-141, /root/reference/src/model_base.py).
Everything is pure: `init_params` builds the pytree, `xe_loss` is the
teacher-forced training objective, and decode entry points live in
comic_tpu.decoding. No modes/classes/variable scopes — train vs eval is an
argument, and parameter reuse is just passing the same pytree.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configuration import Config
from ..tokenization import RadixCodec, Vocabulary
from .attention import AttentionConfig
from .decoder import DecoderConfig, decoder_init, teacher_forced
from .encoders import encode_images, encoder_init, get_encoder

Params = Dict[str, Any]


class ModelSpec(NamedTuple):
    """Static model hyperparameters derived from a Config + vocabulary."""

    cnn_name: str
    fm_endpoint: str
    legacy: bool
    decoder: DecoderConfig
    token_type: str
    radix_base: Optional[int]
    compute_dtype: Any


def softmax_size_for(config: Config, vocab: Vocabulary) -> int:
    """radix: base + 2 digits/GO/EOS rows; else full vocab
    (model_base.py:39-45)."""
    if config.token_type == "radix":
        return config.radix_base + 2
    return len(vocab.itow)


def start_end_ids(config: Config, vocab: Vocabulary) -> Tuple[int, int]:
    """Decode-plane GO/EOS ids (model_base.py:700-707)."""
    if config.token_type == "radix":
        return config.radix_base, config.radix_base + 1
    return vocab.go_id, vocab.eos_id


def max_decode_steps(config: Config, vocab: Vocabulary) -> int:
    """infer_max_length in decode steps: x digits-per-word for radix,
    x5 for char (model_base.py:708-714)."""
    steps = int(config.infer_max_length)
    if config.token_type == "radix":
        steps *= RadixCodec(len(vocab), config.radix_base).word_len
    elif config.token_type == "char":
        steps *= 5
    return steps


def build_model_spec(config: Config, vocab: Vocabulary) -> ModelSpec:
    enc = get_encoder(config.cnn_name)
    fm_endpoint = config.cnn_fm_attention or enc.default_fm_endpoint
    if fm_endpoint not in enc.fm_channels:
        # e.g. the CLI default 'Mixed_4f' with a non-inception_v1 encoder:
        # fall back to the encoder's own attention endpoint
        import sys

        # stderr: bench.py / tools/*_sweep.py promise machine-readable
        # stdout, and every non-inception_v1 encoder trips this with the
        # CLI's 'Mixed_4f' default
        print(f"WARNING: endpoint {fm_endpoint} unknown for "
              f"{config.cnn_name}; using {enc.default_fm_endpoint}.",
              file=sys.stderr)
        fm_endpoint = enc.default_fm_endpoint
        config.cnn_fm_attention = fm_endpoint
    attn = AttentionConfig(
        num_units=config.rnn_size,
        num_heads=config.attn_num_heads,
        memory_channels=enc.fm_channels[fm_endpoint],
        alignment=config.attn_alignment_method,
        probability=config.attn_probability_fn,
        fm_projection=config.cnn_fm_projection,
        context_layer=bool(config.attn_context_layer),
    )
    start_id, end_id = start_end_ids(config, vocab)
    image_embed = 1024 if config.legacy else enc.feature_dim
    dec = DecoderConfig(
        token_type=config.token_type,
        softmax_size=softmax_size_for(config, vocab),
        rnn_name=config.rnn_name,
        rnn_size=config.rnn_size,
        word_size=config.rnn_word_size,
        init_method=config.rnn_init_method,
        image_embed_size=image_embed,
        attention=attn,
        dropout_in=config.dropout_rnn_in,
        dropout_out=config.dropout_rnn_out,
        recurrent_dropout=bool(config.rnn_recurr_dropout),
        attn_keep_prob=config.attn_keep_prob,
        start_id=start_id,
        end_id=end_id,
        initialiser=config.get("initialiser") or "xavier",
    )
    dtype = {"bfloat16": jnp.bfloat16, "float32": None,
             None: None}[config.compute_dtype]
    return ModelSpec(
        cnn_name=config.cnn_name, fm_endpoint=fm_endpoint,
        legacy=bool(config.legacy), decoder=dec,
        token_type=config.token_type,
        radix_base=config.radix_base if config.token_type == "radix" else None,
        compute_dtype=dtype)


def init_params(key, spec: ModelSpec) -> Params:
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": encoder_init(k_enc, spec.cnn_name, spec.legacy),
        "decoder": decoder_init(k_dec, spec.decoder),
    }


# --- input processing (model_base.py:501-528) ------------------------------

def process_captions(captions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, T) padded ids -> (inputs, targets, mask).

    mask = sign(float(cap[:, 1:] + 1)) — valid because <PAD> == -1; targets
    are clipped at 0 so the padded positions index row 0 (they are masked).
    Inputs keep raw ids: the one-hot embedding maps -1 to a zero vector.
    """
    inputs = captions[:, :-1]
    shifted = captions[:, 1:]
    mask = jnp.sign(jnp.asarray(shifted + 1, jnp.float32))
    targets = jnp.maximum(shifted, 0)
    return inputs, targets, mask


# --- losses (model_base.py:325-417) ----------------------------------------

def sequence_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  weights: jnp.ndarray, average_across_batch: bool = True
                  ) -> jnp.ndarray:
    """Weighted softmax cross-entropy.

    Matches tf.contrib.seq2seq.sequence_loss: with batch averaging, the
    mean log-perplexity sum(xent * w) / sum(w); per-example, each row is
    sum_t(xent * w) / sum_t(w).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    xent = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if average_across_batch:
        return jnp.sum(xent * weights) / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.sum(xent * weights, axis=1) / jnp.maximum(
        jnp.sum(weights, axis=1), 1e-12)


def attention_map_loss(alignments: jnp.ndarray, scale: float,
                       valid_steps=None) -> jnp.ndarray:
    """Doubly-stochastic attention regularizer.

    The reference computes mean((1 - sum over the HEAD axis of the maps)^2)
    (model_base.py:355-365 — the axis=1 of its (B, heads, T, L) tensor is
    heads, despite the "time" comment). Reproduced as-is: alignments here
    are (B, T, H, L), so we sum over axis 2.

    `valid_steps` (traced scalar) restricts the mean to the first N decode
    steps. The trainers pass the BATCH-MAX caption length: the reference's
    dynamic_decode stops there, so its map loss never sees the pad steps
    our static pad-to-bucket scan adds (and the scan-of-K trainer pads
    further, to the widest bucket in its stack).
    """
    if scale <= 0:
        return jnp.float32(0.0)
    head_sum = jnp.sum(alignments, axis=2)  # (B, T, L)
    sq = jnp.square(1.0 - head_sum)
    if valid_steps is None:
        return jnp.mean(sq) * scale
    b, t, l = sq.shape
    m = (jnp.arange(t) < valid_steps).astype(sq.dtype)[None, :, None]
    denom = jnp.maximum(b * l * valid_steps.astype(sq.dtype), 1.0)
    return jnp.sum(sq * m) / denom * scale


def xe_forward(params: Params, spec: ModelSpec, images: jnp.ndarray,
               captions: jnp.ndarray, *, rng: Optional[jax.Array] = None,
               training: bool = False
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Teacher-forced forward pass -> (log-perplexity loss, aux dict).

    aux carries the pieces the training step combines: per-token loss,
    attention-map loss inputs, and mask counts for perplexity logging.
    """
    im_embed, fmaps = encode_images(
        params["encoder"], images, spec.cnn_name, spec.fm_endpoint,
        legacy=spec.legacy, dtype=spec.compute_dtype)
    inputs, targets, mask = process_captions(captions)
    logits, alignments = teacher_forced(
        params["decoder"], spec.decoder, inputs, im_embed, fmaps,
        rng=rng, training=training, dtype=spec.compute_dtype)
    log_ppl = sequence_loss(logits, targets, mask)
    aux = {
        "logits": logits,
        "alignments": alignments,
        "mask": mask,
        "targets": targets,
        "log_ppl": log_ppl,
    }
    return log_ppl, aux


def scst_forward(params: Params, spec: ModelSpec, images: jnp.ndarray,
                 captions: jnp.ndarray, rewards: jnp.ndarray, *,
                 rng: Optional[jax.Array] = None, training: bool = True
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """REINFORCE as reward-weighted XE on sampled captions
    (model_base.py:342-347): mean over examples of per-example
    sequence loss x reward."""
    im_embed, fmaps = encode_images(
        params["encoder"], images, spec.cnn_name, spec.fm_endpoint,
        legacy=spec.legacy, dtype=spec.compute_dtype)
    inputs, targets, mask = process_captions(captions)
    logits, alignments = teacher_forced(
        params["decoder"], spec.decoder, inputs, im_embed, fmaps,
        rng=rng, training=training, dtype=spec.compute_dtype)
    per_example = sequence_loss(logits, targets, mask,
                                average_across_batch=False)
    loss = jnp.mean(per_example * rewards)
    aux = {"alignments": alignments, "mask": mask, "log_ppl": loss}
    return loss, aux
