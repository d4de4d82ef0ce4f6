"""Caption id <-> text conversion for all three token types.

Mirrors ``id_to_caption`` (/root/reference/src/infer_fn.py:46-75) and the
per-token-type caption encoders in the input managers
(/root/reference/common/inputs/manager_image_caption.py:206-228,263-281,
334-357,477-509).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .radix import RadixCodec
from .vocab import EOS, GO, PAD, UNK, Vocabulary


def ids_to_captions(
    ids: np.ndarray,
    token_type: str,
    vocab: Vocabulary,
    radix_base: Optional[int] = None,
) -> List[str]:
    """Decode a (batch, time) int array of generated ids into caption strings.

    - radix: digits -> fixed-width groups -> word ids (infer_fn.py:50-63)
    - word:  drop ids < 0 and <EOS>, join with spaces (infer_fn.py:65-74)
    - char:  same but join without spaces
    """
    ids = np.asarray(ids)
    if ids.ndim == 1:
        ids = ids[None]
    captions: List[str] = []
    if token_type == "radix":
        codec = RadixCodec(len(vocab), radix_base)
        for row in ids:
            wids = codec.decode_ids(row.tolist())
            # Invalid composed ids are DROPPED (infer_fn.py:60-63
            # `if word_id < vocab_size: ... else: pass`). Documented
            # divergence: the reference's bound is len(config.itow),
            # which counts the <PAD> '-1' entry, so the one phantom id
            # == len(itow)-1 slips past its check and KeyErrors — an
            # untrained/early checkpoint can emit it. We honor the
            # drop-invalid intent for that id too instead of crashing
            # the sweep.
            captions.append(" ".join(vocab.itow[w] for w in wids
                                     if w in vocab.itow))
    elif token_type in ("word", "char"):
        eos = vocab.eos_id
        joiner = " " if token_type == "word" else ""
        for row in ids:
            # Same drop-invalid guard as the radix branch: the softmax is
            # sized len(itow) (models/captioner.py) while the max mapped id
            # is len(itow)-2 for word (PAD occupies -1), and char has the
            # documented gap id between 'z' and <GO> — an untrained/early
            # checkpoint can emit either. The reference's
            # `config.itow[str(w)]` (infer_fn.py:70) would KeyError there;
            # we drop the id instead of crashing the sweep/SCST step.
            toks = [vocab.itow[w] for w in row.tolist()
                    if w >= 0 and w != eos and w in vocab.itow]
            captions.append(joiner.join(toks))
    else:
        raise ValueError(f"Unknown token_type: {token_type}")
    return captions


def encode_caption_tokens(
    tokens: Sequence[str],
    token_type: str,
    vocab: Vocabulary,
    radix_base: Optional[int] = None,
) -> np.ndarray:
    """Encode a token list (already including <GO>/<EOS>) to an id array.

    word: direct lookup with <UNK> fallback (manager:206-228).
    radix: per-word digit expansion (manager:263-281).
    char: interior tokens are re-joined with spaces and split to chars, then
    wrapped in GO/EOS (manager:334-357).
    """
    if token_type == "word":
        return np.asarray([vocab.id(t) for t in tokens], dtype=np.int32)
    if token_type == "radix":
        codec = RadixCodec(len(vocab), radix_base)
        return codec.encode_caption(
            tokens, vocab.wtoi, vocab.radix_map(radix_base)).astype(np.int32)
    if token_type == "char":
        interior = " ".join(tokens[1:-1])
        ids = [vocab.wtoi[ch] for ch in interior]
        return np.asarray(
            [vocab.go_id] + ids + [vocab.eos_id], dtype=np.int32
        )
    raise ValueError(f"Unknown token_type: {token_type}")


def caption_strings_to_batched_ids(
    captions: Sequence[str],
    token_type: str,
    vocab: Vocabulary,
    radix_base: Optional[int] = None,
    pad_id: int = -1,
) -> np.ndarray:
    """Re-tokenize sampled hypothesis strings into a padded id batch.

    Used as XE targets during SCST training — mirrors
    ``captions_to_batched_ids`` (manager_image_caption.py:477-509).
    """
    rows: List[np.ndarray] = []
    for cap in captions:
        if token_type == "char":
            # Unknown characters are DROPPED (documented divergence: the
            # reference's `c.wtoi[ch]` at manager_image_caption.py:496
            # KeyErrors when a sampled hypothesis leaks a special-token
            # string — e.g. a mid-sequence <GO> id rendered literally by
            # id_to_caption — since '<'/'>' are not in the char vocab;
            # the word path survives the same situation via the <UNK>
            # fallback, so we give char an equivalent guard instead of
            # crashing the SCST train step).
            ids = [vocab.wtoi[ch] for ch in cap if ch in vocab.wtoi]
            row = np.asarray([vocab.go_id] + ids + [vocab.eos_id], dtype=np.int32)
        else:
            toks = [GO] + cap.split() + [EOS]
            row = encode_caption_tokens(toks, token_type, vocab, radix_base)
        rows.append(row)
    max_len = max(r.shape[0] for r in rows)
    if max_len <= 1:
        raise ValueError("All hypotheses are empty.")
    out = np.full((len(rows), max_len), pad_id, dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : r.shape[0]] = r
    return out
