"""Synthetic dataset fixture.

Writes a tiny fake dataset in the exact on-disk format the framework (and the
reference) consume: caption txts, wtoi/itow JSONs, filenames lists, and JPEG
images — the in-memory/test fixture the reference never had (its
`serialise_everything` h5 path, prepro_base.py:288-362, hints at the shape).
Used by unit tests, the benchmark harness, and smoke-training runs.
"""

from __future__ import annotations

import json
import os
import random
from typing import List, Optional, Tuple

import numpy as np

from ..tokenization import EOS, GO, Vocabulary, build_vocab

pjoin = os.path.join

_WORDS = [
    "a", "man", "woman", "dog", "cat", "riding", "sitting", "on", "the",
    "beach", "street", "table", "bike", "red", "blue", "holding", "standing",
    "near", "group", "of", "people", "playing", "with", "in", "park",
]


def make_synthetic_dataset(
    root: str,
    num_train: int = 32,
    num_valid: int = 8,
    num_test: int = 8,
    pattern: str = "synth_{}",
    image_size: int = 256,
    seed: int = 0,
    captions_per_image: int = 2,
    style: str = "coco",
    test_mirrors_train: bool = False,
    distinct_images: bool = False,
) -> Tuple[str, Vocabulary]:
    """Create a dataset under `root`; returns (dataset_dir, vocab).

    style='insta' names images like InstaPIC posts (no trailing numeric
    id), so image ids stay STRINGS end to end (insta_prepro.py).

    test_mirrors_train=True makes the *test* split reuse the train images
    AND captions, so inference on `test` measures memorization of the
    training set — the overfit-convergence gate's fixture
    (tests/test_overfit_gate.py).

    distinct_images=True draws each image as one distinctive solid colour
    (plus mild pixel noise) instead of uniform noise. A random train-time
    crop+flip of a noise image is an unrelatable patch — a model trained
    on those can only ever learn the caption language-model floor — while
    a solid colour survives ANY crop/flip, so image->caption memorization
    is actually learnable. Use for convergence/overfit tests."""
    rng = random.Random(seed)
    np_rng = np.random.default_rng(seed)
    os.makedirs(pjoin(root, "captions"), exist_ok=True)
    os.makedirs(pjoin(root, "images"), exist_ok=True)

    def make_caption() -> List[str]:
        n = rng.randint(4, 12)
        return [rng.choice(_WORDS) for _ in range(n)]

    splits = {"train": num_train, "valid": num_valid, "test": num_test}
    all_train_tokens = []
    from PIL import Image

    records = {}
    img_idx = 0
    for split, count in splits.items():
        rows = []
        for _ in range(count):
            if style == "insta":
                fname = f"images/user{img_idx}_@_post.jpg"
            else:
                fname = f"images/COCO_synth_{img_idx:012d}.jpg"
            if distinct_images:
                colour = np_rng.integers(0, 256, (1, 1, 3))
                noise = np_rng.integers(-20, 21,
                                        (image_size, image_size, 3))
                arr = np.clip(colour + noise, 0, 255).astype(np.uint8)
            else:
                arr = np_rng.integers(0, 256, (image_size, image_size, 3),
                                      dtype=np.uint8)
            Image.fromarray(arr).save(pjoin(root, fname), quality=60)
            n_caps = captions_per_image if split == "train" else 1
            for _ in range(n_caps):
                toks = make_caption()
                rows.append((fname, toks))
                if split == "train":
                    all_train_tokens.append(toks)
            img_idx += 1
        records[split] = rows
    if test_mirrors_train:
        records["test"] = list(records["train"])

    vocab = build_vocab(all_train_tokens, word_count_thres=1,
                        caption_len_thres=20)

    for split, rows in records.items():
        with open(pjoin(root, "captions", pattern.format(split) + ".txt"),
                  "w") as f:
            for fname, toks in rows:
                f.write(f"{fname},{GO} {' '.join(toks)} {EOS}\n")

    vocab.save(pjoin(root, "captions", pattern.format("wtoi") + ".json"),
               pjoin(root, "captions", pattern.format("itow") + ".json"))

    for split in ("valid", "test"):
        files = sorted({fname for fname, _ in records[split]})
        with open(pjoin(root, "captions", f"filenames_{split}.txt"), "w") as f:
            f.write("\n".join(files) + "\n")
        # COCO-format annotation JSON for metric scoring
        anns = []
        for i, (fname, toks) in enumerate(records[split]):
            stem = fname.split("/")[-1].rsplit(".", 1)[0]
            image_id = (stem if style == "insta"
                        else int(stem.split("_")[-1]))
            anns.append({"image_id": image_id, "id": i,
                         "caption": " ".join(toks)})
        with open(pjoin(root, "captions", f"annotations_{split}.json"),
                  "w") as f:
            json.dump({"annotations": anns}, f)

    return root, vocab
