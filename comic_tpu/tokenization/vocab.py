"""Vocabulary construction and (de)serialization.

Contract with the reference artifacts:
  - id layout: <PAD> = pad_value (-1 for the captioning path), then words in
    descending frequency order, then <UNK>, <GO>, <EOS>
    (/root/reference/datasets/preprocessing/prepro_base.py:149-223).
  - JSON files ``{pattern}_wtoi.json`` / ``{pattern}_itow.json``; itow keys
    are strings because of the JSON round-trip
    (/root/reference/common/inputs/manager_image_caption.py:98-108).
  - synthetic char vocab built in code, not from files
    (/root/reference/common/inputs/manager_image_caption.py:299-331).
"""

from __future__ import annotations

import json
import string
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

PAD = "<PAD>"
UNK = "<UNK>"
GO = "<GO>"
EOS = "<EOS>"


@dataclass
class Vocabulary:
    """Word <-> id maps with the reference's id layout."""

    wtoi: Dict[str, int]
    itow: Dict[int, str] = field(default_factory=dict)

    def __post_init__(self):
        if not self.itow:
            self.itow = {i: w for w, i in self.wtoi.items()}

    # --- basic accessors -------------------------------------------------
    def __len__(self) -> int:
        return len(self.wtoi)

    @property
    def pad_id(self) -> int:
        return self.wtoi[PAD]

    @property
    def unk_id(self) -> int:
        return self.wtoi[UNK]

    @property
    def go_id(self) -> int:
        return self.wtoi[GO]

    @property
    def eos_id(self) -> int:
        return self.wtoi[EOS]

    def word(self, idx: int) -> str:
        return self.itow[int(idx)]

    def id(self, word: str) -> int:
        return self.wtoi.get(word, self.wtoi[UNK])

    def radix_map(self, base: int) -> Dict[str, list]:
        """Cached token -> radix-digit-list map (RadixCodec.build_radix_wtoi
        is O(vocab); rebuilding it per caption measured ~2.3 s per SCST
        step at the COCO vocab size)."""
        cache = getattr(self, "_radix_maps", None)
        if cache is None:
            cache = {}
            self._radix_maps = cache
        if base not in cache:
            from .radix import RadixCodec

            cache[base] = RadixCodec(len(self), base).build_radix_wtoi(
                self.wtoi)
        return cache[base]

    # --- serialization ---------------------------------------------------
    def save(self, wtoi_path: str, itow_path: str) -> None:
        with open(wtoi_path, "w") as f:
            json.dump(self.wtoi, f)
        with open(itow_path, "w") as f:
            json.dump({str(k): v for k, v in self.itow.items()}, f)

    @classmethod
    def load(cls, wtoi_path: str, itow_path: Optional[str] = None) -> "Vocabulary":
        with open(wtoi_path) as f:
            wtoi = {k: int(v) for k, v in json.load(f).items()}
        itow = None
        if itow_path is not None:
            with open(itow_path) as f:
                itow = {int(k): v for k, v in json.load(f).items()}
        return cls(wtoi, itow or {})

    @classmethod
    def from_str_itow(cls, wtoi: Dict[str, int], itow: Dict[str, str]) -> "Vocabulary":
        """Build from reference-style dicts (itow keys may be str)."""
        return cls(
            {k: int(v) for k, v in wtoi.items()},
            {int(k): v for k, v in itow.items()},
        )


def build_vocab(
    train_token_lists: Iterable[Sequence[str]],
    word_count_thres: int = 5,
    caption_len_thres: int = 20,
    vocab_size: Optional[int] = None,
    pad_value: int = -1,
    include_go_eos: bool = True,
) -> Vocabulary:
    """Count words in training captions and assign ids.

    Words are counted only up to ``caption_len_thres`` tokens per caption,
    kept if ``count >= word_count_thres`` (or the top ``vocab_size`` when a
    fixed size is requested), and ordered by descending (count, word) —
    exactly prepro_base.py:179-223.
    """
    if pad_value < -1:
        raise ValueError("pad_value must be >= -1")
    counts: Dict[str, int] = {}
    for tokens in train_token_lists:
        for w_count, w in enumerate(tokens):
            if w_count < caption_len_thres:
                counts[w] = counts.get(w, 0) + 1

    cw = sorted(((c, w) for w, c in counts.items()), reverse=True)
    if vocab_size is None:
        vocab = [w for c, w in cw if c >= word_count_thres]
    else:
        vocab = [w for _, w in cw[:vocab_size]]

    wtoi: Dict[str, int] = {}
    idx = pad_value
    wtoi[PAD] = idx
    idx += 1
    for w in vocab:
        wtoi[w] = idx
        idx += 1
    wtoi[UNK] = idx
    idx += 1
    if include_go_eos:
        wtoi[GO] = idx
        wtoi[EOS] = idx + 1
    return Vocabulary(wtoi)


def build_char_vocab(pad_value: int = -1) -> Vocabulary:
    """Synthetic character vocabulary.

    Layout (manager_image_caption.py:299-331): <PAD>=pad_value, ' ' next,
    then digits 0-9 and a-z; <GO> and <EOS> are assigned ``len(ctoi)`` at
    insertion time, which leaves one unused id between 'z' and <GO> when
    pad_value == -1 — reproduced verbatim for checkpoint/id compatibility.
    """
    char_list = list(string.digits + string.ascii_lowercase)
    ctoi: Dict[str, int] = {}
    itoc: Dict[int, str] = {}
    idx = pad_value
    ctoi[PAD] = idx
    itoc[idx] = PAD
    idx += 1
    ctoi[" "] = idx
    itoc[idx] = " "
    idx += 1
    for ch in char_list:
        ctoi[ch] = idx
        itoc[idx] = ch
        idx += 1
    ctoi[GO] = len(ctoi)
    ctoi[EOS] = len(ctoi)
    itoc[len(itoc)] = GO
    itoc[len(itoc)] = EOS
    return Vocabulary(ctoi, itoc)
