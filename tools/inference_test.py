#!/usr/bin/env python
"""Minimal single-image chat smoke test.

Equivalent of ``pretrained/inference_test.py``: load a checkpoint, tile one
image, ask a question, print the answer.

Usage:
  python tools/inference_test.py --checkpoint <hf-safetensors-or-orbax-dir> \
      --tokenizer <hf-name> --image photo.jpg \
      --question "Please describe the image shortly."
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--question",
                   default="Please describe the image shortly.")
    p.add_argument("--config-preset", default="internvl2_2b")
    p.add_argument("--max-num", type=int, default=12)
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--rope_pos_id_version", default=None)
    p.add_argument("--rope_pos_id_stride", type=int, default=None)
    args = p.parse_args()

    from v2pe_tpu.data.datasets import load_image
    from v2pe_tpu.evalkit.cli import load_chat_model
    from v2pe_tpu.infer.generate import GenerationConfig

    model = load_chat_model(args)
    pixels, n_tiles = model.load_pixels(load_image(args.image),
                                        max_num=args.max_num)
    print(f"tiled into {n_tiles} x 448x448 patches")
    response = model.chat(
        pixels, args.question,
        GenerationConfig(max_new_tokens=args.max_new_tokens),
        num_patches_list=[n_tiles],
        rope_pos_id_version=args.rope_pos_id_version,
        rope_pos_id_stride=args.rope_pos_id_stride)
    print(f"User: {args.question}\nAssistant: {response}")


if __name__ == "__main__":
    main()
