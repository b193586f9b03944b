from v2pe_tpu.models import intern_vit, internlm2, internvl_chat, params

__all__ = ["intern_vit", "internlm2", "internvl_chat", "params"]
