"""Independent numpy transcription of contrib BeamSearchDecoder semantics,
cross-checked against `beam_search_from_memory`.

VERDICT r4 Weak #5: the beam search's contrib parity was "self-derived" —
locked-semantics tests plus exhaustive-search optima, but no independent
rendering of the tf.contrib.seq2seq semantics the reference runs
(`src/ops_rnn.py:98-170` drives contrib's BeamSearchDecoder). This file
adds that second, structurally unrelated transcription: explicit
per-hypothesis Python bookkeeping (candidate triples, list-of-token
sequences, per-batch sorts) with none of search.py's vectorized machinery
(no flattened top_k, no parent-pointer backtrack, no lax loops). The two
implementations share ONLY the decoder step itself (`embed_ids` +
`step_grouped`, goldens-tested in test_models_core/test_ops), so
bit-identical per-step log-probs feed two independent searches.

Contrib semantics transcribed here (tf 1.x beam_search_decoder.py):
- `_mask_probs`: a finished beam's next-token distribution is locked to
  the EOS column with 0 added log-prob (-inf elsewhere).
- `_beam_search_step` candidate lengths for the penalty add +1 to live
  beams EXCEPT in the EOS column (`one_hot(end_token, on=0, off=1)`);
  the CARRIED length after selection adds +1 whenever the parent was
  live — so an emitted EOS IS counted in later steps' penalties even
  though it was uncounted at its own selection (the contrib quirk
  search.py reproduces at search.py:340-347).
- score = cumulative-logp / ((5 + len) / 6) ** alpha; selection is
  top-k over all K*V candidates, ties to the lowest flat index
  (beam-major), matching lax.top_k.
- the next cumulative log-prob is the UNpenalized total of the winner.
- finalize performs no re-sort beyond the last step's selection order.

Any divergence between the two transcriptions would surface as an id or
score mismatch below (checked over all K beams, both the fixed-length
scan and early-exit while_loop paths, alphas {0, 0.6, 1.0}, and two
model/memory seeds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.models.attention import AttentionConfig, precompute
from comic_tpu.models.captioner import ModelSpec
from comic_tpu.models.decoder import (
    DecoderConfig,
    decoder_init,
    embed_ids,
    initial_state,
    step_grouped,
)
from comic_tpu.decoding import beam_search_from_memory

V = 7  # softmax size; start=5, end=6
START, END = 5, 6
NEG_INF = np.float32(-1e9)


def _spec():
    attn = AttentionConfig(num_units=8, num_heads=2, memory_channels=8,
                           fm_projection="tied")
    dec = DecoderConfig(
        token_type="word", softmax_size=V, rnn_name="LSTM", rnn_size=8,
        word_size=4, init_method="first_input", image_embed_size=6,
        attention=attn, start_id=START, end_id=END)
    return ModelSpec(cnn_name="inception_v1", fm_endpoint="Mixed_4f",
                     legacy=False, decoder=dec, token_type="word",
                     radix_base=None, compute_dtype=None)


def _penalty(length, alpha):
    if alpha == 0.0:
        return np.float32(1.0)
    return np.float32((5.0 + np.float32(length)) / np.float32(6.0)) \
        ** np.float32(alpha)


def oracle_beam_search(dec_params, spec, im_embed, memory, *, k, max_steps,
                       alpha):
    """Explicit-hypothesis contrib beam search. Returns
    (ids (B,K,T), scores (B,K), lengths (B,K)) sorted best-first."""
    dcfg = spec.decoder
    B = int(im_embed.shape[0])

    def rep_rows(x):
        return jnp.repeat(x, k, axis=0)

    state = jax.tree_util.tree_map(
        rep_rows, initial_state(dec_params, dcfg, im_embed))

    # Per-(batch, beam) bookkeeping, plain Python containers.
    cum = np.full((B, k), 0.0, np.float32)
    cum[:, 1:] = NEG_INF  # only beam 0 starts live
    finished = np.zeros((B, k), bool)
    lengths = np.zeros((B, k), np.int64)
    seqs = [[[] for _ in range(k)] for _ in range(B)]
    prev = np.full((B, k), START, np.int64)
    last_scores = np.zeros((B, k), np.float32)

    for _ in range(max_steps):
        wv = embed_ids(dec_params, dcfg,
                       jnp.asarray(prev.reshape(-1), jnp.int32))
        logits, _, state = step_grouped(dec_params, dcfg, wv, state, memory,
                                        k)
        logp = np.asarray(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ).reshape(B, k, V)

        new_cum = np.zeros_like(cum)
        new_fin = np.zeros_like(finished)
        new_len = np.zeros_like(lengths)
        new_prev = np.zeros_like(prev)
        parents = np.zeros((B, k), np.int64)
        for b in range(B):
            cands = []  # (score, flat_idx, total, parent, token)
            for j in range(k):
                for v in range(V):
                    if finished[b, j]:
                        add = np.float32(0.0) if v == END else NEG_INF
                        cand_len = lengths[b, j]
                    else:
                        add = logp[b, j, v]
                        # selection-time length: EOS emission uncounted
                        cand_len = lengths[b, j] + (0 if v == END else 1)
                    total = np.float32(cum[b, j] + add)
                    score = np.float32(total / _penalty(cand_len, alpha))
                    cands.append((score, j * V + v, total, j, v))
            cands.sort(key=lambda c: (-c[0], c[1]))
            winners = cands[:k]
            new_seqs_b = []
            for newj, (score, _, total, j, v) in enumerate(winners):
                was_fin = finished[b, j]
                new_cum[b, newj] = total
                new_fin[b, newj] = was_fin or v == END
                # carried length DOES count the EOS-emitting step
                new_len[b, newj] = lengths[b, j] + (0 if was_fin else 1)
                new_prev[b, newj] = v
                parents[b, newj] = j
                emitted = END if was_fin else v
                new_seqs_b.append(seqs[b][j] + [emitted])
                last_scores[b, newj] = score
            seqs[b] = new_seqs_b
        cum, finished, lengths, prev = new_cum, new_fin, new_len, new_prev

        # Reorder the decoder state rows to follow the winning parents.
        row_idx = np.concatenate(
            [b * k + parents[b] for b in range(B)]).astype(np.int32)
        state = jax.tree_util.tree_map(lambda x: x[jnp.asarray(row_idx)],
                                       state)

    ids = np.zeros((B, k, max_steps), np.int64)
    scores = np.zeros((B, k), np.float32)
    lens = np.zeros((B, k), np.int64)
    for b in range(B):
        order = sorted(range(k), key=lambda j: (-last_scores[b, j], j))
        for rank, j in enumerate(order):
            ids[b, rank] = seqs[b][j]
            scores[b, rank] = last_scores[b, j]
            lens[b, rank] = lengths[b, j]
    return ids, scores, lens


@pytest.fixture(scope="module", params=[7, 19])
def setup(request):
    spec = _spec()
    p = decoder_init(jax.random.PRNGKey(request.param), spec.decoder)
    rng = np.random.default_rng(request.param)
    B, L = 3, 5
    im = jnp.asarray(rng.normal(size=(B, 6)).astype(np.float32))
    fm = jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32))
    mem = precompute(p["attention"], spec.decoder.attention, fm)
    return spec, p, im, mem


@pytest.mark.parametrize("alpha", [0.0, 0.6, 1.0])
@pytest.mark.parametrize("early_exit", [False, True])
def test_matches_oracle(setup, alpha, early_exit):
    spec, p, im, mem = setup
    K, T = 3, 9
    top, all_beams = beam_search_from_memory(
        p, spec, im, mem, beam_size=K, max_steps=T, length_penalty=alpha,
        collect_alignments=False, early_exit=early_exit)
    want_ids, want_scores, want_lens = oracle_beam_search(
        p, spec, im, mem, k=K, max_steps=T, alpha=alpha)

    got_ids = np.asarray(all_beams["ids"]).transpose(1, 0, 2)  # (B, K, T)
    got_scores = np.asarray(all_beams["scores"]).transpose(1, 0)
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_allclose(got_scores, want_scores, rtol=2e-6)
    np.testing.assert_array_equal(np.asarray(top.ids), want_ids[:, 0])
    np.testing.assert_array_equal(np.asarray(top.lengths), want_lens[:, 0])
