"""Golden tests for the token/vocab/radix core."""

import numpy as np
import pytest

from comic_tpu.tokenization import (
    EOS,
    GO,
    PAD,
    UNK,
    RadixCodec,
    Vocabulary,
    base_arr_to_int,
    build_char_vocab,
    build_vocab,
    caption_strings_to_batched_ids,
    encode_caption_tokens,
    ids_to_captions,
    number_to_base,
)


class TestNumberToBase:
    def test_zero(self):
        assert number_to_base(0, 256) == [0]

    def test_hand_cases(self):
        assert number_to_base(255, 256) == [255]
        assert number_to_base(256, 256) == [1, 0]
        assert number_to_base(9962, 256) == [38, 234]
        assert number_to_base(7, 2) == [1, 1, 1]
        assert number_to_base(10, 10) == [1, 0]

    def test_base_less_than_two_raises(self):
        with pytest.raises(ValueError):
            number_to_base(5, 1)

    def test_roundtrip(self):
        for n in [0, 1, 9, 255, 256, 65535, 65536, 123456]:
            for b in [2, 8, 10, 85, 256]:
                assert base_arr_to_int(number_to_base(n, b), b) == n


class TestRadixCodec:
    def test_width_from_full_vocab_len(self):
        # width counts len(wtoi) including specials (manager:240)
        codec = RadixCodec(vocab_len=9962, base=256)
        assert codec.word_len == 2
        assert codec.go_id == 256
        assert codec.eos_id == 257
        assert codec.softmax_size == 258

    def test_fixed_width_left_pad(self):
        codec = RadixCodec(vocab_len=9962, base=256)
        assert codec.encode_word_id(5) == [0, 5]
        assert codec.encode_word_id(256) == [1, 0]

    def test_decode_drops_specials_and_oov(self):
        codec = RadixCodec(vocab_len=300, base=16)  # word_len = 3
        # GO, digits for 258 (0x102 -> [1,0,2]), EOS, PAD
        ids = [16, 1, 0, 2, 17, -1]
        assert codec.decode_ids(ids) == [258]
        # 0xFFF = 4095 >= 300 -> discarded
        assert codec.decode_ids([15, 15, 15]) == []

    def test_decode_incomplete_group_reference_semantics(self):
        # infer_fn.py:55-60: drop exactly ONE trailing digit when not a
        # multiple of word_len, then stride — the remaining short trailing
        # group decodes as a short word (word_len=3 here: 0x12C bound)
        codec = RadixCodec(vocab_len=300, base=16)
        assert codec.decode_ids([1, 0, 2, 1, 0]) == [258, 1]
        # already a multiple: nothing dropped
        assert codec.decode_ids([1, 0, 2]) == [258]
        # one extra digit: dropped, leaving a clean group
        assert codec.decode_ids([1, 0, 2, 5]) == [258]

    def test_radix_wtoi(self):
        wtoi = {PAD: -1, "a": 0, "b": 1, UNK: 2, GO: 3, EOS: 4}
        codec = RadixCodec(vocab_len=len(wtoi), base=2)
        rw = codec.build_radix_wtoi(wtoi)
        assert rw[GO] == [2]
        assert rw[EOS] == [3]
        assert rw[PAD] == [-1]
        # width = len(number_to_base(6, 2)) = 3
        assert rw["b"] == [0, 0, 1]

    def test_requires_pad_minus_one(self):
        codec = RadixCodec(vocab_len=5, base=2)
        with pytest.raises(ValueError):
            codec.build_radix_wtoi({PAD: 0, GO: 1, EOS: 2, UNK: 3})


class TestBuildVocab:
    def test_id_layout(self):
        caps = [["a", "b", "a"], ["a", "c"]]
        v = build_vocab(caps, word_count_thres=1, caption_len_thres=20)
        # PAD=-1, words by desc freq (a=0 first), then UNK, GO, EOS
        assert v.pad_id == -1
        assert v.wtoi["a"] == 0
        assert set([v.wtoi["b"], v.wtoi["c"]]) == {1, 2}
        assert v.unk_id == 3
        assert v.go_id == 4
        assert v.eos_id == 5

    def test_count_threshold(self):
        caps = [["a", "a", "b"]]
        v = build_vocab(caps, word_count_thres=2)
        assert "a" in v.wtoi and "b" not in v.wtoi

    def test_fixed_vocab_size(self):
        caps = [["a"] * 5 + ["b"] * 3 + ["c"]]
        v = build_vocab(caps, vocab_size=2)
        assert "a" in v.wtoi and "b" in v.wtoi and "c" not in v.wtoi

    def test_len_thres_limits_counting(self):
        caps = [["x"] * 3 + ["y"]]
        v = build_vocab(caps, word_count_thres=1, caption_len_thres=3)
        assert "y" not in v.wtoi  # y appears only at position 3


class TestCharVocab:
    def test_layout_matches_reference_quirk(self):
        v = build_char_vocab()
        assert v.pad_id == -1
        assert v.wtoi[" "] == 0
        assert v.wtoi["0"] == 1
        assert v.wtoi["a"] == 11
        assert v.wtoi["z"] == 36
        # id 37 unused; GO=38, EOS=39 (manager:320-327 quirk)
        assert v.go_id == 38
        assert v.eos_id == 39
        assert len(v.itow) == 40


def _word_vocab():
    return Vocabulary(
        {PAD: -1, "a": 0, "cat": 1, "sat": 2, UNK: 3, GO: 4, EOS: 5}
    )


class TestIdsToCaptions:
    def test_word(self):
        v = _word_vocab()
        ids = np.array([[0, 1, 2, 5, -1, -1]])
        assert ids_to_captions(ids, "word", v) == ["a cat sat"]

    def test_word_keeps_go_if_present(self):
        # reference only filters ids<0 and EOS (infer_fn.py:67-69)
        v = _word_vocab()
        ids = np.array([[4, 0, 5]])
        assert ids_to_captions(ids, "word", v) == ["<GO> a"]

    def test_radix_roundtrip(self):
        v = _word_vocab()  # len 6 -> base 4 -> width 2
        base = 4
        toks = [GO, "a", "cat", "sat", EOS]
        ids = encode_caption_tokens(toks, "radix", v, radix_base=base)
        # GO=4, a=[0,0], cat=[0,1], sat=[0,2], EOS=5
        np.testing.assert_array_equal(ids, [4, 0, 0, 0, 1, 0, 2, 5])
        caps = ids_to_captions(ids[None], "radix", v, radix_base=base)
        assert caps == ["a cat sat"]

    def test_char_roundtrip(self):
        v = build_char_vocab()
        toks = [GO, "cat", "sat", EOS]
        ids = encode_caption_tokens(toks, "char", v)
        assert ids[0] == v.go_id and ids[-1] == v.eos_id
        # decode sees generated ids, i.e. everything after <GO>
        caps = ids_to_captions(ids[None, 1:], "char", v)
        assert caps == ["cat sat"]

    def test_radix_oov_word_discarded(self):
        v = _word_vocab()
        base = 4
        # digits [3,3] -> 15 >= 6 -> dropped
        caps = ids_to_captions(np.array([[3, 3, 0, 1]]), "radix", v, radix_base=base)
        assert caps == ["cat"]

    def test_radix_phantom_id_dropped_not_crash(self):
        # len(vocab)=6 counts <PAD>, so composed id 5 == EOS exists but a
        # phantom id len(itow)-1 does NOT exist when PAD occupies -1; the
        # codec's bound (mirroring infer_fn.py:60) lets it through and the
        # reference KeyErrors on it — we drop it (documented divergence,
        # tokenization/text.py). digits [1,1] -> 5 = EOS token string.
        v = Vocabulary({PAD: -1, "a": 0, "cat": 1, UNK: 2, GO: 3, EOS: 4})
        # len 6 -> base 4 -> width 2; composed [1,1] -> 5: valid per the
        # bound (5 < 6) but absent from itow (ids are -1..4)
        caps = ids_to_captions(np.array([[1, 1, 0, 1]]), "radix", v,
                               radix_base=4)
        assert caps == ["cat"]

    def test_word_phantom_softmax_id_dropped_not_crash(self):
        # softmax_size = len(itow) (models/captioner.py) while the max
        # mapped id is len(itow)-2 (PAD sits at -1): an untrained model can
        # emit len(itow)-1. Reference `config.itow[str(w)]`
        # (infer_fn.py:70) KeyErrors there; we drop it (documented
        # divergence, tokenization/text.py).
        v = _word_vocab()  # ids -1..5; softmax emits 0..6
        caps = ids_to_captions(np.array([[0, 6, 1]]), "word", v)
        assert caps == ["a cat"]

    def test_char_gap_id_dropped_not_crash(self):
        # the char vocab's documented gap id between 'z' and <GO>
        v = build_char_vocab()
        gap = v.go_id - 1
        assert gap not in v.itow
        ids = np.array([[v.wtoi["c"], gap, v.wtoi["a"], v.wtoi["t"]]])
        assert ids_to_captions(ids, "char", v) == ["cat"]


class TestScstBatchedIds:
    def test_word_padding(self):
        v = _word_vocab()
        out = caption_strings_to_batched_ids(["a cat", "sat"], "word", v)
        np.testing.assert_array_equal(
            out, [[4, 0, 1, 5], [4, 2, 5, -1]]
        )

    def test_unk_fallback(self):
        v = _word_vocab()
        out = caption_strings_to_batched_ids(["dog"], "word", v)
        np.testing.assert_array_equal(out, [[4, 3, 5]])

    def test_radix(self):
        v = _word_vocab()
        out = caption_strings_to_batched_ids(["a"], "radix", v, radix_base=4)
        np.testing.assert_array_equal(out, [[4, 0, 0, 5]])

    def test_char_unknown_chars_dropped_not_crash(self):
        # a sampled char hypothesis can leak a literal special-token string
        # ('a<GO>t' from a mid-sequence GO id); the reference KeyErrors on
        # '<' (manager_image_caption.py:496) — we drop unknown chars
        # (documented divergence, tokenization/text.py)
        v = build_char_vocab()
        out = caption_strings_to_batched_ids(["a<>t"], "char", v)
        np.testing.assert_array_equal(
            out, [[v.go_id, v.wtoi["a"], v.wtoi["t"], v.eos_id]])
