#!/usr/bin/env bash
# InternVL2.5-8B V2PE stage-1 long-context recipe on TPU — the reference's
# /root/reference/shell/internlm2_5_8b/internvl2_5_8b_dynamic_res_v2pe_stage1.sh
# (128k packed rows, v2pe_rnd, --chunk_num 4 --attn_type ring, zero-3,
# drop_path 0.1, lr 5e-6, cosine, square loss reduction) translated to
# v2pe_tpu. Ring group = mesh `seq` axis (4 chips per 128k row, zigzag
# layout); zero-3 = fsdp. Stage 2 (32k re-pack, scripts mirror the same
# flags at --max_packed_tokens 34000) reuses this launcher with
# SEQ_LEN=34000 SEQ_SHARDS=1 SAVE_STEPS=2000.
set -euo pipefail

MODEL_PATH=${MODEL_PATH:-pretrained/InternVL2_5-8B}
META_PATH=${META_PATH:-shell/data/annotation_train_1M.json}
OUTPUT_DIR=${OUTPUT_DIR:-work_dirs/v2pe_8b_128k_stage1}
CHIPS=${CHIPS:-32}
SEQ_SHARDS=${SEQ_SHARDS:-4}     # reference chunk_num 4
SEQ_LEN=${SEQ_LEN:-131072}
SAVE_STEPS=${SAVE_STEPS:-2500}
FSDP=$((CHIPS / SEQ_SHARDS))
mkdir -p "$OUTPUT_DIR"

python -m v2pe_tpu.train.cli \
  --model_name_or_path "$MODEL_PATH" \
  --model_preset internvl2_5_8b \
  --tokenizer "$MODEL_PATH" \
  --dtype bfloat16 \
  --meta_path "$META_PATH" \
  --output_dir "$OUTPUT_DIR" \
  --force_image_size 448 \
  --drop_path_rate 0.1 \
  --max_packed_tokens "$SEQ_LEN" \
  --max_tiles 500 \
  --rows_per_batch 1 \
  --rope_pos_id_version v2pe_rnd \
  --loss_reduction square \
  --mesh_data 1 \
  --mesh_fsdp "$FSDP" \
  --mesh_seq "$SEQ_SHARDS" \
  --learning_rate 5e-6 \
  --weight_decay 0.05 \
  --warmup_steps 600 \
  --max_steps 20000 \
  --save_steps "$SAVE_STEPS" \
  --save_total_limit 5 \
  --report_to jsonl tensorboard \
  "$@" 2>&1 | tee -a "$OUTPUT_DIR/training_log.txt"
