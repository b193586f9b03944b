from v2pe_tpu.infer.generate import GenerationConfig, generate
from v2pe_tpu.infer.chat import ChatModel

__all__ = ["GenerationConfig", "generate", "ChatModel"]
