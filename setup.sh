#!/bin/bash
# Dataset setup entry point (mirrors the reference src/setup.sh:1-27):
# runs MS-COCO prepro, InstaPIC prepro, and the SCST n-gram caches.
# Inputs (Karpathy dataset_coco.json, insta JSONs, images) must already be
# under datasets/ — this environment has no network egress.
set -e
cd "$(dirname "$0")"

COCO_DIR=${COCO_DIR:-datasets/mscoco}
INSTA_DIR=${INSTA_DIR:-datasets/insta}

if [ -f "$COCO_DIR/dataset_coco.json" ]; then
    python -m comic_tpu.prepro.coco --dataset_dir "$COCO_DIR"
    python -m comic_tpu.prepro.ngrams --dataset_dir "$COCO_DIR" \
        --dataset_file_pattern "mscoco_{}_w5_s20_include_restval"
else
    echo "SKIP: $COCO_DIR/dataset_coco.json not found"
fi

if [ -f "$INSTA_DIR/json/insta-caption-train.json" ]; then
    python -m comic_tpu.prepro.insta --dataset_dir "$INSTA_DIR"
    python -m comic_tpu.prepro.ngrams --dataset_dir "$INSTA_DIR" \
        --dataset_file_pattern "insta_{}_v25595_s15"
else
    echo "SKIP: $INSTA_DIR insta JSONs not found"
fi
