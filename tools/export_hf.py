"""Export a v2pe_tpu checkpoint back to HF safetensors.

The reference's checkpoints are HF `save_pretrained` dirs; this tool makes
our orbax checkpoints consumable there: it converts the params pytree to
the exact InternVLChatModel key layout (models/export.py) and writes
`model.safetensors`. Pass --hf-template (the original HF checkpoint dir) to
copy config.json / tokenizer / remote-code files next to the weights so the
result loads with `AutoModel.from_pretrained(..., trust_remote_code=True)`.

    python tools/export_hf.py --checkpoint out/step_00020000 \
        --config-preset internvl2_2b --out export_dir \
        [--hf-template pretrained/InternVL2-2B] [--dtype bfloat16]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="orbax step dir (contains params/) or its parent")
    p.add_argument("--config-preset", default="internvl2_2b")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float16", "float32"])
    p.add_argument("--hf-template", default=None,
                   help="original HF checkpoint dir; its non-weight files "
                        "are copied into --out")
    p.add_argument("--lora-base", default=None,
                   help="when --checkpoint is a LoRA ADAPTER checkpoint "
                        "(train --use_llm_lora/--use_backbone_lora), the "
                        "base weights to merge into: an HF safetensors dir "
                        "or an orbax step dir")
    args = p.parse_args(argv)

    import jax

    # the session image pins the TPU platform over the env var; honor
    # JAX_PLATFORMS=cpu explicitly (conversion is a host-side job)
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        jax.config.update("jax_platforms", want)

    import orbax.checkpoint as ocp

    from v2pe_tpu.core import config as cfg_lib
    from v2pe_tpu.models.export import (export_torch_state_dict,
                                        save_safetensors)

    ckpt = args.checkpoint
    if not os.path.isdir(os.path.join(ckpt, "params")):
        from v2pe_tpu.core.checkpoint import latest_checkpoint

        latest = latest_checkpoint(ckpt)
        if latest is None:
            raise SystemExit(f"no params/ under {ckpt} and no step dirs")
        ckpt = latest
    cfg_json = os.path.join(ckpt, "config.json")
    if os.path.isfile(cfg_json):
        with open(cfg_json) as f:
            cfg = cfg_lib.VLMConfig.from_json(f.read())
    else:
        cfg = getattr(cfg_lib, args.config_preset)()

    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(os.path.abspath(os.path.join(ckpt, "params")))

    lora = None
    if args.lora_base:
        lora, base = params, args.lora_base
        if os.path.isdir(os.path.join(base, "params")):
            with ocp.PyTreeCheckpointer() as ckptr:
                params = ckptr.restore(
                    os.path.abspath(os.path.join(base, "params")))
        else:
            import jax.numpy as jnp

            from v2pe_tpu.models.params import load_safetensors_checkpoint

            params = load_safetensors_checkpoint(base, cfg, jnp.float32)

    os.makedirs(args.out, exist_ok=True)
    if args.hf_template:
        for name in os.listdir(args.hf_template):
            if name.endswith((".safetensors", ".bin", ".index.json")):
                continue
            src = os.path.join(args.hf_template, name)
            if os.path.isfile(src):
                shutil.copy2(src, os.path.join(args.out, name))
    sd = export_torch_state_dict(params, cfg, lora=lora)
    out_file = os.path.join(args.out, "model.safetensors")
    save_safetensors(sd, out_file, args.dtype)
    print(f"wrote {out_file} ({len(sd)} tensors, {args.dtype})")


if __name__ == "__main__":
    main()
