from v2pe_tpu.data import constants, tiling, transforms, conversation, preprocess

__all__ = ["constants", "tiling", "transforms", "conversation", "preprocess"]
