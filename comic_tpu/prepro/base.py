"""Dataset preprocessing core: tokenised dataset -> framework artifacts.

Re-implementation of the reference's offline prep layer
(/root/reference/datasets/preprocessing/prepro_base.py): consumes a
Karpathy-style tokenised dataset and emits the stable on-disk contract
(SURVEY.md §1): per-split caption txts
(``filepath,<GO> tokens <EOS>``, truncated to the caption length
threshold, restval folded into train — prepro_base.py:226-254), wtoi/itow
vocab JSONs (build_vocab id layout :149-223), and
``filenames_{valid,test}.txt`` lists.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from ..tokenization import EOS, GO, Vocabulary, build_vocab

pjoin = os.path.join

_NON_ALNUM = re.compile(r"[^a-z0-9 ]")


class TokenisedImage(dict):
    """{'filepath': rel path, 'split': str, 'tokens': [[w, ...], ...],
    'image_id': int|str}"""


def clean_tokens(tokens: Sequence[str]) -> List[str]:
    """Default cleaning: lowercase, strip non-alphanumerics
    (prepro_base.py:75-90)."""
    out = []
    for t in tokens:
        t = _NON_ALNUM.sub("", t.lower())
        if t:
            out.append(t)
    return out


def tokenise_karpathy(dataset_json: str, image_dir_map: Optional[Dict[str, str]] = None
                      ) -> List[TokenisedImage]:
    """Parse a Karpathy split JSON (dataset_coco.json format)."""
    with open(dataset_json) as f:
        data = json.load(f)
    out: List[TokenisedImage] = []
    for img in data["images"]:
        subdir = img.get("filepath", "")
        if image_dir_map and subdir in image_dir_map:
            subdir = image_dir_map[subdir]
        rel = pjoin(subdir, img["filename"]) if subdir else img["filename"]
        out.append(TokenisedImage(
            filepath=rel,
            split=img.get("split", "train"),
            tokens=[clean_tokens(s["tokens"]) for s in img["sentences"]],
            image_id=img.get("cocoid", img.get("imgid",
                                               img["filename"])),
        ))
    return out


def convert_split(split: str, include_restval: bool = True) -> str:
    """restval -> train (or dropped); val -> valid (prepro_base.py:28-31)."""
    if split == "restval":
        return "train" if include_restval else "none"
    if split == "val":
        return "valid"
    return split


def train_token_lists(dataset: Iterable[TokenisedImage],
                      include_restval: bool = True
                      ) -> List[List[str]]:
    out = []
    for d in dataset:
        if convert_split(d["split"], include_restval) == "train":
            out.extend(d["tokens"])
    return out


def write_caption_txts(
    dataset: Sequence[TokenisedImage],
    out_dir: str,
    prefix: str,
    caption_len_thres: int = 20,
    include_restval: bool = True,
) -> Dict[str, int]:
    """Per-split `{prefix}_{split}.txt` files, V1 line format
    (prepro_base.py:226-254). Returns per-split line counts."""
    os.makedirs(out_dir, exist_ok=True)
    lines: Dict[str, List[str]] = {"train": [], "valid": [], "test": []}
    for d in dataset:
        split = convert_split(d["split"], include_restval)
        if split not in lines:
            continue
        for toks in d["tokens"]:
            capped = toks[:caption_len_thres]
            lines[split].append(
                f"{d['filepath']},{GO} {' '.join(capped)} {EOS}")
    for split, ls in lines.items():
        with open(pjoin(out_dir, prefix.format(split) + ".txt"), "w") as f:
            f.write("\n".join(ls) + ("\n" if ls else ""))
    # split disjointness assertion (coco_prepro.py:140-146)
    files = {s: {l.split(",")[0] for l in ls} for s, ls in lines.items()}
    assert not (files["train"] & files["valid"])
    assert not (files["train"] & files["test"])
    assert not (files["valid"] & files["test"])
    return {s: len(ls) for s, ls in lines.items()}


def write_vocab(dataset: Sequence[TokenisedImage], out_dir: str,
                prefix: str, *, word_count_thres: int = 5,
                caption_len_thres: int = 20,
                vocab_size: Optional[int] = None,
                include_restval: bool = True) -> Vocabulary:
    vocab = build_vocab(
        train_token_lists(dataset, include_restval),
        word_count_thres=word_count_thres,
        caption_len_thres=caption_len_thres,
        vocab_size=vocab_size)
    vocab.save(pjoin(out_dir, prefix.format("wtoi") + ".json"),
               pjoin(out_dir, prefix.format("itow") + ".json"))
    return vocab


def write_filename_lists(dataset: Sequence[TokenisedImage], out_dir: str,
                         include_restval: bool = True) -> None:
    for split, fname in (("valid", "filenames_valid.txt"),
                         ("test", "filenames_test.txt")):
        files = sorted({d["filepath"] for d in dataset
                        if convert_split(d["split"], include_restval) == split})
        with open(pjoin(out_dir, fname), "w") as f:
            f.write("\n".join(files) + ("\n" if files else ""))


def write_annotation_jsons(dataset: Sequence[TokenisedImage], out_dir: str,
                           name_fmt: str = "annotations_{}.json",
                           include_restval: bool = True) -> None:
    """COCO-format annotation JSONs for valid/test metric scoring (the
    reference ships captions_val2014.json; insta_prepro emits its own,
    insta_prepro.py:223-305)."""
    os.makedirs(out_dir, exist_ok=True)
    for split in ("valid", "test"):
        anns = []
        images = []
        i = 0
        for d in dataset:
            if convert_split(d["split"], include_restval) != split:
                continue
            images.append({"id": d["image_id"]})
            for toks in d["tokens"]:
                anns.append({"image_id": d["image_id"], "id": i,
                             "caption": " ".join(toks)})
                i += 1
        with open(pjoin(out_dir, name_fmt.format(split)), "w") as f:
            json.dump({"annotations": anns, "images": images,
                       "type": "captions", "licenses": [], "info": {}}, f)
