#!/usr/bin/env python
"""Tile-splitting statistics tester.

Equivalent of ``pretrained/test_image_patch.py``: run dynamic_preprocess
over a dataset's images and report the tile-count distribution.

Usage:
  python tools/test_image_patch.py --meta shell-style-meta.json \
      [--max-num 12] [--limit 500]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import json
import os
from collections import Counter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meta", required=True,
                   help="dataset meta json ({name: {root, annotation}})")
    p.add_argument("--max-num", type=int, default=12)
    p.add_argument("--image-size", type=int, default=448)
    p.add_argument("--limit", type=int, default=500)
    args = p.parse_args()

    from v2pe_tpu.data.datasets import load_image
    from v2pe_tpu.data.tiling import plan_tiles

    with open(args.meta) as f:
        metas = json.load(f)

    for name, meta in metas.items():
        counts = Counter()
        root = meta.get("root", "") or ""
        n_done = 0
        with open(meta["annotation"]) as f:
            for line in f:
                if n_done >= args.limit:
                    break
                item = json.loads(line)
                img_field = item.get("image")
                if not img_field:
                    continue
                paths = img_field if isinstance(img_field, list) \
                    else [img_field]
                for rel in paths:
                    img = load_image(os.path.join(root, rel))
                    w, h = img.size
                    _, _, n, _ = plan_tiles(
                        w, h, max_num=args.max_num,
                        image_size=args.image_size, use_thumbnail=True)
                    counts[n] += 1
                n_done += 1
        total = sum(counts.values())
        print(f"[{name}] images={total} tile distribution:")
        for k in sorted(counts):
            print(f"  {k:3d} tiles: {counts[k]:6d} "
                  f"({100.0 * counts[k] / total:.1f}%)")


if __name__ == "__main__":
    main()
