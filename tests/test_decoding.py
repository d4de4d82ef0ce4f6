"""Decode-search tests: greedy vs manual, beam vs exhaustive, EOS handling.

Runs on a tiny decoder over synthetic attention memory (no CNN) via the
*_from_memory entry points.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.models.attention import (AttentionConfig, AttentionMemory,
                                         precompute)
from comic_tpu.models.captioner import ModelSpec
from comic_tpu.models.decoder import (
    DecoderConfig,
    decoder_init,
    embed_ids,
    initial_state,
    step,
)
from comic_tpu.decoding import (
    beam_search_from_memory,
    greedy_or_sample_from_memory,
)

V = 5  # softmax size; start=3, end=4
START, END = 3, 4


def _spec(num_heads=2, mem_ch=8):
    attn = AttentionConfig(num_units=8, num_heads=num_heads,
                           memory_channels=mem_ch, fm_projection="tied")
    dec = DecoderConfig(
        token_type="word", softmax_size=V, rnn_name="LSTM", rnn_size=8,
        word_size=4, init_method="first_input", image_embed_size=6,
        attention=attn, start_id=START, end_id=END)
    return ModelSpec(cnn_name="inception_v1", fm_endpoint="Mixed_4f",
                     legacy=False, decoder=dec, token_type="word",
                     radix_base=None, compute_dtype=None)


@pytest.fixture(scope="module")
def setup():
    spec = _spec()
    p = decoder_init(jax.random.PRNGKey(42), spec.decoder)
    rng = np.random.default_rng(7)
    B, L = 3, 6
    im = jnp.asarray(rng.normal(size=(B, 6)).astype(np.float32))
    fm = jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32))
    mem = precompute(p["attention"], spec.decoder.attention, fm)
    return spec, p, im, mem


def _manual_greedy(spec, p, im, mem, max_steps):
    """Step-by-step greedy loop in plain Python."""
    B = im.shape[0]
    st = initial_state(p, spec.decoder, im)
    prev = jnp.full((B,), START, jnp.int32)
    finished = np.zeros(B, bool)
    rows = [[] for _ in range(B)]
    for _ in range(max_steps):
        wv = embed_ids(p, spec.decoder, prev)
        logits, _, st = step(p, spec.decoder, wv, st, mem)
        nxt = np.argmax(np.asarray(logits), -1)
        for b in range(B):
            rows[b].append(-1 if finished[b] else int(nxt[b]))
        finished |= nxt == END
        prev = jnp.asarray(nxt, jnp.int32)
        if finished.all():
            break
    for r in rows:
        r.extend([-1] * (max_steps - len(r)))
    return np.asarray(rows)


class TestGreedy:
    def test_matches_manual(self, setup):
        spec, p, im, mem = setup
        T = 8
        out = greedy_or_sample_from_memory(p, spec, im, mem, max_steps=T)
        want = _manual_greedy(spec, p, im, mem, T)
        got = np.asarray(out.ids)
        # positions after all-finished early exit stay PAD in both
        np.testing.assert_array_equal(got, want)

    def test_alignment_shapes(self, setup):
        spec, p, im, mem = setup
        out = greedy_or_sample_from_memory(p, spec, im, mem, max_steps=4)
        assert out.alignments.shape == (3, 2, 4, 6)  # (B, H, T, L)

    def test_sampling_reproducible_and_varied(self, setup):
        spec, p, im, mem = setup
        k = jax.random.PRNGKey(1)
        o1 = greedy_or_sample_from_memory(p, spec, im, mem, max_steps=6,
                                          sample=True, rng=k)
        o2 = greedy_or_sample_from_memory(p, spec, im, mem, max_steps=6,
                                          sample=True, rng=k)
        np.testing.assert_array_equal(o1.ids, o2.ids)
        o3 = greedy_or_sample_from_memory(p, spec, im, mem, max_steps=6,
                                          sample=True,
                                          rng=jax.random.PRNGKey(2))
        assert not np.array_equal(np.asarray(o1.ids), np.asarray(o3.ids))


def _exhaustive_best(spec, p, im, mem, max_steps, score_fn=None):
    """Enumerate every hypothesis and return the best one per item.

    score_fn(total_logp, hyp) ranks hypotheses (default: raw log-prob)."""
    B = im.shape[0]
    best = [(-np.inf, None)] * B
    score_fn = score_fn or (lambda lp, hyp: lp)

    def seq_logprob(tokens):
        st = initial_state(p, spec.decoder, im)
        prev = jnp.full((B,), START, jnp.int32)
        total = np.zeros(B)
        for t, tok in enumerate(tokens):
            wv = embed_ids(p, spec.decoder, prev)
            logits, _, st = step(p, spec.decoder, wv, st, mem)
            logp = np.asarray(jax.nn.log_softmax(logits, -1))
            total += logp[:, tok]
            prev = jnp.full((B,), tok, jnp.int32)
        return total

    # hypotheses: token strings over {0,1,2} terminated by END (or full len)
    alphabet = [0, 1, 2]
    hyps = []
    for length in range(1, max_steps):
        for pre in itertools.product(alphabet, repeat=length):
            hyps.append(tuple(pre) + (END,))
    hyps.extend(tuple(s) for s in itertools.product(alphabet, repeat=max_steps))
    # also immediate END
    hyps.append((END,))
    for hyp in hyps:
        lp = seq_logprob(hyp)
        for b in range(B):
            sc = score_fn(lp[b], hyp)
            if sc > best[b][0]:
                best[b] = (sc, hyp)
    return best


class TestBeam:
    def test_beam1_equals_greedy(self, setup):
        spec, p, im, mem = setup
        T = 8
        g = greedy_or_sample_from_memory(p, spec, im, mem, max_steps=T)
        top, _ = beam_search_from_memory(p, spec, im, mem, beam_size=1,
                                         max_steps=T)
        g_ids = np.asarray(g.ids)
        b_ids = np.asarray(top.ids)
        for b in range(g_ids.shape[0]):
            # compare up to and including EOS; beam pads with END after
            g_row = [t for t in g_ids[b] if t >= 0]
            b_row = list(b_ids[b][: len(g_row)])
            assert g_row == b_row, (g_row, b_row)

    def test_wide_beam_finds_exhaustive_optimum(self, setup):
        spec, p, im, mem = setup
        T = 3
        # beam of 16 >= 4^2 candidate prefixes -> exact search at T=3
        top, _ = beam_search_from_memory(p, spec, im, mem, beam_size=16,
                                         max_steps=T)
        best = _exhaustive_best(spec, p, im, mem, T)
        for b, (lp, hyp) in enumerate(best):
            np.testing.assert_allclose(float(top.scores[b]), lp, rtol=1e-4)
            got = list(np.asarray(top.ids)[b][: len(hyp)])
            assert tuple(got) == hyp, (b, got, hyp)

    def test_wide_beam_lpen_matches_contrib_scoring(self, setup):
        """Exact search at T=3 with length penalty 1.0: the top beam must
        maximize the CONTRIB scoring function — a hypothesis finished
        before the last step is ranked by lp(length incl. EOS), one
        finishing exactly at the last step by lp(length excl. EOS)
        (_beam_search_step's one_hot(end) zero-add), an unfinished one by
        lp(max_steps)."""
        spec, p, im, mem = setup
        T, alpha = 3, 1.0
        top, _ = beam_search_from_memory(p, spec, im, mem, beam_size=16,
                                         max_steps=T, length_penalty=alpha)

        def lp(n):
            return ((5.0 + n) / 6.0) ** alpha

        def contrib_score(total, hyp):
            if END not in hyp:
                return total / lp(T)
            e = hyp.index(END)
            return total / lp(e if e == T - 1 else e + 1)

        best = _exhaustive_best(spec, p, im, mem, T,
                                score_fn=contrib_score)
        for b, (sc, hyp) in enumerate(best):
            np.testing.assert_allclose(float(top.scores[b]), sc, rtol=1e-4)
            got = list(np.asarray(top.ids)[b][: len(hyp)])
            assert tuple(got) == hyp, (b, got, hyp)

    def test_all_beams_layout_and_order(self, setup):
        spec, p, im, mem = setup
        top, all_beams = beam_search_from_memory(p, spec, im, mem,
                                                 beam_size=4, max_steps=5)
        assert all_beams["ids"].shape == (4, 3, 5)  # (beam, batch, time)
        scores = np.asarray(all_beams["scores"])  # (beam, batch)
        assert (np.diff(scores, axis=0) <= 1e-6).all()  # best-first
        np.testing.assert_array_equal(all_beams["ids"][0], np.asarray(top.ids))

    def test_length_penalty_changes_scores(self, setup):
        spec, p, im, mem = setup
        t0, _ = beam_search_from_memory(p, spec, im, mem, beam_size=3,
                                        max_steps=6, length_penalty=0.0)
        t1, _ = beam_search_from_memory(p, spec, im, mem, beam_size=3,
                                        max_steps=6, length_penalty=2.0)
        assert not np.allclose(np.asarray(t0.scores), np.asarray(t1.scores))

    def test_lpen_scores_match_contrib_locked_semantics(self, setup):
        """contrib quirk (beam_search_decoder._beam_search_step): the step
        that EMITS EOS is not counted at selection time, but the carried
        length includes it — so a beam finished before max_steps is scored
        total_logp / lp(carried length incl. EOS) at every later step."""
        spec, p, im, mem = setup
        B = im.shape[0]
        T = 10
        top, _ = beam_search_from_memory(p, spec, im, mem, beam_size=4,
                                         max_steps=T, length_penalty=1.0)
        ids = np.asarray(top.ids)
        lens = np.asarray(top.lengths)
        st = initial_state(p, spec.decoder, im)
        prev = np.full((B,), START, np.int64)
        total = np.zeros(B)
        for t in range(T):
            wv = embed_ids(p, spec.decoder, jnp.asarray(prev))
            logits, _, st = step(p, spec.decoder, wv, st, mem)
            logp = np.asarray(jax.nn.log_softmax(logits, -1))
            active = t < lens
            tok = ids[:, t]
            total += np.where(active, logp[np.arange(B), tok], 0.0)
            prev = np.where(active, tok, END)
        lp = ((5.0 + lens) / 6.0) ** 1.0
        for b in range(B):
            if lens[b] < T:  # finished: carried length includes EOS
                np.testing.assert_allclose(float(top.scores[b]),
                                           total[b] / lp[b], rtol=1e-4)

    @pytest.mark.parametrize("eos_bias,lpen", [
        (0.0, 0.0),    # EOS rarely wins within 12 steps (late/no finish)
        (1.5, 0.0),    # beams finish at staggered mid steps
        (1.5, 1.0),    # with contrib length-penalty scoring
        (8.0, 0.0),    # everything finishes almost immediately
    ])
    def test_early_exit_matches_full_scan(self, setup, eos_bias, lpen):
        """The while_loop early-exit decode (contrib dynamic_decode stop
        condition) must produce bit-identical ids/scores/lengths to the
        fixed-length scan, across finish-time profiles."""
        spec, p, im, mem = setup
        p2 = jax.tree_util.tree_map(jnp.array, p)
        p2["output_projection"] = dict(p2["output_projection"])
        p2["output_projection"]["bias"] = (
            p2["output_projection"]["bias"].at[END].add(eos_bias))
        kw = dict(beam_size=3, max_steps=12, length_penalty=lpen,
                  collect_alignments=False)
        top_s, all_s = beam_search_from_memory(
            p2, spec, im, mem, early_exit=False, **kw)
        top_w, all_w = beam_search_from_memory(
            p2, spec, im, mem, early_exit=True, **kw)
        np.testing.assert_array_equal(np.asarray(top_s.ids),
                                      np.asarray(top_w.ids))
        np.testing.assert_allclose(np.asarray(top_s.scores),
                                   np.asarray(top_w.scores), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(top_s.lengths),
                                      np.asarray(top_w.lengths))
        np.testing.assert_array_equal(np.asarray(all_s["ids"]),
                                      np.asarray(all_w["ids"]))
        np.testing.assert_allclose(np.asarray(all_s["scores"]),
                                   np.asarray(all_w["scores"]), rtol=1e-6)

    @pytest.mark.parametrize("eos_bias", [0.0, 1.5, 8.0])
    def test_greedy_early_exit_matches_full_scan(self, setup, eos_bias):
        spec, p, im, mem = setup
        p2 = jax.tree_util.tree_map(jnp.array, p)
        p2["output_projection"] = dict(p2["output_projection"])
        p2["output_projection"]["bias"] = (
            p2["output_projection"]["bias"].at[END].add(eos_bias))
        kw = dict(max_steps=12, collect_alignments=False)
        out_s = greedy_or_sample_from_memory(p2, spec, im, mem,
                                             early_exit=False, **kw)
        out_w = greedy_or_sample_from_memory(p2, spec, im, mem,
                                             early_exit=True, **kw)
        np.testing.assert_array_equal(np.asarray(out_s.ids),
                                      np.asarray(out_w.ids))
        np.testing.assert_allclose(np.asarray(out_s.scores),
                                   np.asarray(out_w.scores), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out_s.lengths),
                                      np.asarray(out_w.lengths))

    def test_finished_beams_locked_to_eos(self, setup):
        spec, p, im, mem = setup
        top, _ = beam_search_from_memory(p, spec, im, mem, beam_size=3,
                                         max_steps=10)
        ids = np.asarray(top.ids)
        for row, n in zip(ids, np.asarray(top.lengths)):
            after = row[int(n):]
            assert (after == END).all()


class TestServingBatchFence:
    """The >52 MB attention-memory VMEM-residency warning
    (tools/batch_sweep.py measurement, decoding/search.py)."""

    @staticmethod
    def _memory(batch, mem_len=196, units=512, dtype=jnp.bfloat16):
        heads = 8
        return AttentionMemory(
            keys=jnp.zeros((batch, mem_len, units), dtype),
            values=jnp.zeros((batch, heads, mem_len, units // heads), dtype))

    def test_b128_comic_shapes_silent(self, capsys):
        from comic_tpu.decoding.search import _warn_if_memory_spills
        _warn_if_memory_spills(self._memory(128), "beam-3 decode")
        assert "WARNING" not in capsys.readouterr().out

    def test_b136_comic_shapes_warns_with_fast_batch(self, capsys):
        from comic_tpu.decoding.search import _warn_if_memory_spills
        _warn_if_memory_spills(self._memory(136), "beam-3 decode")
        captured = capsys.readouterr()
        # stderr, NOT stdout: bench.py and tools/*_sweep.py promise
        # machine-readable stdout, and their traced programs trip this
        assert captured.out == ""
        err = captured.err
        assert "re-streams" in err and "batch <= 129" in err

    def test_data_parallel_global_batch_judged_per_device(self, capsys):
        # traced shapes are GLOBAL under jit: global batch 1024 over 8
        # chips is 128/chip — the fast regime; must NOT warn
        from comic_tpu.decoding.search import _warn_if_memory_spills
        _warn_if_memory_spills(self._memory(1024), "beam-3 decode",
                               dp_shards=8)
        assert capsys.readouterr().err == ""

    def test_data_parallel_spill_reports_per_device(self, capsys):
        # 1088/8 = 136/chip — past the boundary even sharded
        from comic_tpu.decoding.search import _warn_if_memory_spills
        _warn_if_memory_spills(self._memory(1088), "beam-3 decode",
                               dp_shards=8)
        err = capsys.readouterr().err
        assert "8-way data-parallel" in err
        assert "batch <= 1032" in err  # 129/device * 8
