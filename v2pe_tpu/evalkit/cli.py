"""Benchmark evaluation CLI.

Counterpart of the reference's per-benchmark torchrun scripts
(``scripts/evaluate*.sh`` + ``eval/<bench>/eval_*.py``): one entry point,
sharded by --rank/--world (the reference used torchrun ranks), resumable via
answered-id skip sets, with the checkpoint's V2PE settings overridable by
``--rope_pos_id_version/--rope_pos_id_stride`` (STRIDE env parity).

Example:
  python -m v2pe_tpu.evalkit.cli --benchmark mm_niah \
      --checkpoint /path/to/ckpt --config-preset internvl2_2b \
      --tokenizer internlm/internlm2-chat-1_8b \
      --data questions.jsonl --outputs-dir out/ --task retrieval-text-test
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--benchmark", required=True,
                   choices=["mm_niah", "milebench", "longvqa", "vqa"])
    p.add_argument("--checkpoint", required=True,
                   help="orbax step dir (params/) or HF safetensors dir")
    p.add_argument("--config-preset", default="internvl2_2b")
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--data", required=True, help="questions jsonl")
    p.add_argument("--outputs-dir", required=True)
    p.add_argument("--task", default="test")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world", type=int, default=1)
    p.add_argument("--max-num", type=int, default=12,
                   help="tile budget per image")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--rope_pos_id_version", default=None)
    p.add_argument("--rope_pos_id_stride", type=int,
                   default=int(os.environ.get("STRIDE", 0)) or None)
    p.add_argument("--score-only", action="store_true")
    return p


def load_chat_model(args):
    import dataclasses

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from v2pe_tpu.core import config as cfg_lib
    from v2pe_tpu.data.constants import SPECIAL_TOKENS
    from v2pe_tpu.infer.chat import ChatModel
    from v2pe_tpu.models.params import load_safetensors_checkpoint

    cfg = getattr(cfg_lib, args.config_preset)()
    if args.rope_pos_id_version:
        cfg = dataclasses.replace(cfg,
                                  rope_pos_id_version=args.rope_pos_id_version)
    if args.rope_pos_id_stride:
        cfg = dataclasses.replace(cfg,
                                  rope_pos_id_stride=args.rope_pos_id_stride)

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer,
                                              trust_remote_code=True)
    tokenizer.add_tokens(list(SPECIAL_TOKENS), special_tokens=True)

    if os.path.isdir(os.path.join(args.checkpoint, "params")):
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            params = ckptr.restore(
                os.path.abspath(os.path.join(args.checkpoint, "params")))
    else:
        params = load_safetensors_checkpoint(args.checkpoint, cfg,
                                             jnp.bfloat16)
    return ChatModel(params, cfg, tokenizer)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = build_argparser().parse_args(argv)
    os.makedirs(args.outputs_dir, exist_ok=True)

    if args.benchmark == "mm_niah":
        from v2pe_tpu.evalkit import mm_niah, runner

        if args.score_only:
            print(json.dumps(mm_niah.score_directory(args.outputs_dir),
                             indent=2))
            return
        model = load_chat_model(args)
        from v2pe_tpu.infer.generate import GenerationConfig

        infer = mm_niah.build_infer_fn(
            model, max_tiles=args.max_num,
            rope_pos_id_version=args.rope_pos_id_version,
            rope_pos_id_stride=args.rope_pos_id_stride,
            generation_config=GenerationConfig(
                max_new_tokens=args.max_new_tokens))
        items = [json.loads(l) for l in open(args.data)]
        out = os.path.join(args.outputs_dir,
                           f"model_{args.task}.rank{args.rank}.jsonl")
        n = runner.run_shard(items, infer, out, rank=args.rank,
                             world=args.world)
        logging.info("answered %d items -> %s", n, out)
        if args.rank == 0 and args.world == 1:
            merged = os.path.join(args.outputs_dir,
                                  f"model_{args.task}.jsonl")
            runner.merge_shards([out], merged)
            print(json.dumps(mm_niah.score_jsonl(merged, args.task),
                             indent=2))
    else:
        raise SystemExit(
            f"benchmark {args.benchmark}: use the library adapters "
            "(v2pe_tpu.evalkit.milebench / longvqa) — CLI wiring lands with "
            "their dataset formats")


if __name__ == "__main__":
    main()
