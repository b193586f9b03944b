"""v2pe_tpu — a TPU-native (JAX/XLA/Pallas/pjit) long-context vision-language
framework with the capabilities of V2PE (OpenGVLab's InternVL2-2B fork for
multimodal contexts up to 1M tokens).

Built from scratch for TPU: Pallas flash/ring attention kernels whose rotary
stage consumes V2PE's variable-increment float32 position ids, pjit/Mesh
sharding in place of DeepSpeed+NCCL, static-shape packed data pipeline, and an
HF-compatible chat/generate API.

Reference behavior parity targets are cited per-module as
``/root/reference/<file>:<line>``.
"""

__version__ = "0.1.0"
