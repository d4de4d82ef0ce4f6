#!/bin/bash
# Usage examples, mirroring the reference's src/example.sh.
DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" >/dev/null 2>&1 && pwd )"

cd "${DIR}"

### Training
# Default: COMIC-256 on MS-COCO (radix-256, 8 heads, tied projection)
python train.py

# Custom MS-COCO directory
python train.py \
    --dataset_dir '/data/MSCOCO_captions'

# Word token baseline, custom MS-COCO directory
python train.py \
    --token_type 'word' \
    --dataset_dir '/data/MSCOCO_captions'

# InstaPIC (eval split divides batch 50)
python train.py \
    --dataset_file_pattern 'insta_{}_v25595_s15' \
    --batch_size_eval 50

# Stage chaining: CNN fine-tune from the decoder run, then SCST
python train.py --train_mode cnn_finetune --run 1
python train.py --train_mode scst --run 1

# Multi-chip data parallelism (batch sharded over all local devices)
python train.py --num_data_shards 8

### Inference
# Checkpoint sweep + metric scores
python infer.py \
    --infer_checkpoints_dir 'experiments/mscoco/radix_b256_add_LN_softmax_h8_tie_lstm_run_01' \
    --annotations_file 'datasets/mscoco/captions/annotations_test.json'

# Specific checkpoints, save attention maps, skip scoring
python infer.py \
    --infer_checkpoints_dir 'experiments/mscoco/radix_b256_add_LN_softmax_h8_tie_lstm_run_01' \
    --infer_checkpoints '170000,177000' \
    --save_attention_maps '1' \
    --get_metric_score ''

# InstaPIC test split
python infer.py \
    --infer_checkpoints_dir 'experiments/insta/radix_b256_add_LN_softmax_h8_tie_lstm_run_01' \
    --dataset_dir '/data/InstaPIC' \
    --infer_set 'test'
