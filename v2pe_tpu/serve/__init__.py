from v2pe_tpu.serve.worker import ModelWorker

__all__ = ["ModelWorker"]
