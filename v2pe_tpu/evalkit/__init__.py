from v2pe_tpu.evalkit import metrics, runner

__all__ = ["metrics", "runner"]
