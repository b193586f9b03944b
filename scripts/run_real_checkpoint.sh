#!/usr/bin/env bash
# Real-checkpoint runbook: one command from an HF snapshot to a scored
# benchmark shard. Counterpart of the reference's manual sequence
# (/root/reference/pretrained/inference_test.py + eval/mm_niah scripts).
#
#   1. (once, on a machine with egress)
#        huggingface-cli download OpenGVLab/InternVL2-2B \
#            --local-dir /data/InternVL2-2B
#      The snapshot dir holds *.safetensors shards + config.json +
#      tokenizer files; nothing else is needed — the HF config.json is
#      bridged to this framework's VLMConfig automatically
#      (v2pe_tpu/core/config.py:vlm_config_from_hf), and the safetensors
#      state dict is converted on load
#      (v2pe_tpu/models/params.py:load_safetensors_checkpoint).
#
#   2. scripts/run_real_checkpoint.sh /data/InternVL2-2B photo.jpg
#
#   3. (optional) one MM-NIAH shard:
#        MMNIAH_DATA=/data/mm-niah/retrieval-text-test.jsonl \
#        MMNIAH_ROOT=/data/mm-niah \
#        scripts/run_real_checkpoint.sh /data/InternVL2-2B photo.jpg
#
# Works for any supported family (InternVL2-2B / InternVL2.5-8B /
# Qwen2- and Llama-decoder variants): the architecture comes from the
# snapshot's config.json, not from a preset.
set -euo pipefail

SNAPSHOT=${1:?usage: run_real_checkpoint.sh <hf_snapshot_dir> [image] }
IMAGE=${2:-}
TOKENIZER=${TOKENIZER:-$SNAPSHOT}   # InternVL snapshots embed the tokenizer
OUT=${OUT:-/tmp/real_ckpt_run}
mkdir -p "$OUT"

echo "== [1/3] converter smoke: HF snapshot -> VLMConfig + params =="
python - "$SNAPSHOT" <<'PY'
import sys

import jax.numpy as jnp

from v2pe_tpu.core.config import load_vlm_config
from v2pe_tpu.models.params import load_safetensors_checkpoint

snap = sys.argv[1]
cfg = load_vlm_config(f"{snap}/config.json")
print(f"config: llm={cfg.llm.arch} L={cfg.llm.num_hidden_layers} "
      f"H={cfg.llm.hidden_size} rope={cfg.rope_pos_id_version}"
      f"/{cfg.rope_pos_id_stride} template={cfg.template}")
params = load_safetensors_checkpoint(snap, cfg, jnp.bfloat16)
n = sum(x.size for x in __import__("jax").tree.leaves(params))
print(f"loaded {n/1e9:.2f}B params")
PY

if [ -n "$IMAGE" ]; then
  echo "== [2/3] single-image chat smoke =="
  python tools/inference_test.py \
    --checkpoint "$SNAPSHOT" --tokenizer "$TOKENIZER" --image "$IMAGE"
else
  echo "== [2/3] skipped (no image argument) =="
fi

if [ -n "${MMNIAH_DATA:-}" ]; then
  echo "== [3/3] MM-NIAH shard (rank 0/8 of ${MMNIAH_DATA}) =="
  python -m v2pe_tpu.evalkit.cli --benchmark mm_niah \
    --checkpoint "$SNAPSHOT" --tokenizer "$TOKENIZER" \
    --data "$MMNIAH_DATA" --data-root "${MMNIAH_ROOT:-$(dirname "$MMNIAH_DATA")}" \
    --outputs-dir "$OUT/mm_niah" --task "${MMNIAH_TASK:-retrieval-text-test}" \
    --rank 0 --world 8
  echo "outputs + scores under $OUT/mm_niah"
else
  echo "== [3/3] skipped (set MMNIAH_DATA=<questions.jsonl> to run) =="
fi
echo "runbook complete"
