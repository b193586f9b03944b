#!/usr/bin/env bash
# InternVL2-2B V2PE 256k ring-attention recipe on TPU — the reference's
# /root/reference/shell/internlm2_2b/internvl_chat_v2_internlm2_2b_dynamic_res_v2pe_256k.sh
# (--attn_type ring --chunk_num 8) translated to v2pe_tpu. The ring group
# becomes the mesh `seq` axis: each group of 8 chips holds one 256k
# sequence in the zigzag layout (parallel/ring.py), remaining chips stack
# on fsdp. V2PE_SEQ_LEN sizes the static packed row (the reference packs
# to max_packed_tokens and pads to a 2*chunk_num multiple at runtime; we
# pad once, statically — XLA compiles one shape).
set -euo pipefail

MODEL_PATH=${MODEL_PATH:-pretrained/InternVL2-2B}
META_PATH=${META_PATH:-shell/data/annotation_train_256k.json}
OUTPUT_DIR=${OUTPUT_DIR:-work_dirs/v2pe_256k_ring}
CHIPS=${CHIPS:-32}
SEQ_SHARDS=${SEQ_SHARDS:-8}   # reference chunk_num
FSDP=$((CHIPS / SEQ_SHARDS))

python -m v2pe_tpu.train.cli \
  --model_name_or_path "$MODEL_PATH" \
  --model_preset internvl2_2b \
  --tokenizer "$MODEL_PATH" \
  --dtype bfloat16 \
  --meta_path "$META_PATH" \
  --output_dir "$OUTPUT_DIR" \
  --force_image_size 448 \
  --drop_path_rate 0.1 \
  --max_packed_tokens 262144 \
  --max_tiles 1024 \
  --rows_per_batch 1 \
  --rope_pos_id_version v2pe_rnd \
  --loss_reduction square \
  --mesh_data 1 \
  --mesh_fsdp "$FSDP" \
  --mesh_seq "$SEQ_SHARDS" \
  --use_8bit_optimizer \
  --learning_rate 5e-6 \
  --weight_decay 0.05 \
  --warmup_steps 600 \
  --max_steps 20000 \
  --save_steps 2500 \
  --save_total_limit 5 \
  --report_to jsonl tensorboard \
  "$@" 2>&1 | tee -a "$OUTPUT_DIR/training_log.txt"
