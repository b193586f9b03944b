#!/usr/bin/env python
"""Text + visual token budget audit over a dataset.

Equivalent of ``pretrained/token_count.py`` (multithreaded text+visual token
counting; grid tiling variant at :40-63 — floor-division grid instead of
aspect-ratio search).

Usage:
  python tools/token_count.py --meta meta.json --tokenizer <hf-name> \
      [--num-image-token 256] [--grid] [--workers 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import json
import os
from concurrent.futures import ThreadPoolExecutor


def grid_tiles(w: int, h: int, image_size: int = 448) -> int:
    """token_count.py:40-63 grid variant: floor-division tiling."""
    nx = max(w // image_size, 1)
    ny = max(h // image_size, 1)
    return nx * ny


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meta", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--num-image-token", type=int, default=256)
    p.add_argument("--image-size", type=int, default=448)
    p.add_argument("--max-num", type=int, default=12)
    p.add_argument("--grid", action="store_true",
                   help="grid tiling variant instead of aspect-ratio search")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    from transformers import AutoTokenizer

    from v2pe_tpu.data.datasets import load_image
    from v2pe_tpu.data.tiling import plan_tiles

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer,
                                              trust_remote_code=True)

    with open(args.meta) as f:
        metas = json.load(f)

    def count_one(root, item):
        text = "\n".join(c["value"] for c in item.get("conversations", []))
        n_text = len(tokenizer(text)["input_ids"])
        n_vis = 0
        img_field = item.get("image")
        paths = ([] if not img_field else
                 img_field if isinstance(img_field, list) else [img_field])
        for rel in paths:
            img = load_image(os.path.join(root, rel))
            w, h = img.size
            if args.grid:
                n = grid_tiles(w, h, args.image_size)
            else:
                _, _, n, _ = plan_tiles(w, h, max_num=args.max_num,
                                        image_size=args.image_size,
                                        use_thumbnail=True)
            n_vis += n * args.num_image_token
        return n_text, n_vis

    for name, meta in metas.items():
        root = meta.get("root", "") or ""
        with open(meta["annotation"]) as f:
            items = [json.loads(l) for l in f]
        if args.limit:
            items = items[:args.limit]
        with ThreadPoolExecutor(max_workers=args.workers) as ex:
            results = list(ex.map(lambda it: count_one(root, it), items))
        text_tok = sum(r[0] for r in results)
        vis_tok = sum(r[1] for r in results)
        print(f"[{name}] samples={len(items)} text_tokens={text_tok} "
              f"visual_tokens={vis_tok} "
              f"avg_total={(text_tok + vis_tok) / max(len(items), 1):.0f}")


if __name__ == "__main__":
    main()
