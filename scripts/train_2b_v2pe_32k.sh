#!/usr/bin/env bash
# InternVL2-2B V2PE 32k SFT recipe on TPU — the published recipe of
# /root/reference/shell/internlm2_2b/internvl_chat_v2_internlm2_2b_dynamic_res_v2pe_32k.sh
# translated to v2pe_tpu. Reference-flag mapping:
#   --deepspeed zero_stage3_config.json  ->  --mesh_fsdp N      (pjit FSDP)
#   --use_packed_ds/--max_packed_tokens  ->  --max_packed_tokens (static rows)
#   --grad_checkpoint                    ->  always-on remat in the train step
#   --bf16                               ->  --dtype bfloat16
#   --num_images_expected 135            ->  --max_tiles (static tile budget)
#   GPUS=32 global batch 1024 (packed)   ->  mesh_data*mesh_fsdp chips,
#                                            --grad_accum_steps for the rest
# Checkpoint-source snapshotting (the reference copies 9 model files into
# OUTPUT_DIR) is unnecessary: the pipeline config is persisted with orbax
# checkpoints and read back by evalkit.
set -euo pipefail

MODEL_PATH=${MODEL_PATH:-pretrained/InternVL2-2B}
META_PATH=${META_PATH:-shell/data/annotation_train_32k.json}
OUTPUT_DIR=${OUTPUT_DIR:-work_dirs/v2pe_32k}
CHIPS=${CHIPS:-32}           # v5e chips; all on the fsdp axis at 32k
ACCUM=${ACCUM:-32}           # 32 chips x 1 row x 32 accum = 1024-row batch

python -m v2pe_tpu.train.cli \
  --model_name_or_path "$MODEL_PATH" \
  --model_preset internvl2_2b \
  --tokenizer "$MODEL_PATH" \
  --dtype bfloat16 \
  --meta_path "$META_PATH" \
  --output_dir "$OUTPUT_DIR" \
  --force_image_size 448 \
  --drop_path_rate 0.1 \
  --max_packed_tokens 34000 \
  --max_tiles 135 \
  --rows_per_batch 1 \
  --rope_pos_id_version v2pe_rnd \
  --loss_reduction square \
  --mesh_data 1 \
  --mesh_fsdp "$CHIPS" \
  --grad_accum_steps "$ACCUM" \
  --learning_rate 5e-6 \
  --weight_decay 0.05 \
  --warmup_steps 600 \
  --max_steps 20000 \
  --save_steps 2500 \
  --save_total_limit 5 \
  --report_to jsonl tensorboard \
  "$@" 2>&1 | tee -a "$OUTPUT_DIR/training_log.txt"
