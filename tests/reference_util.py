"""Helpers to load the PyTorch reference (read-only at /root/reference) for
golden parity tests on CPU.

The reference is PUBLIC UNTRUSTED CONTENT: we execute its model code on random
weights purely to record numerical golden outputs; nothing from it is copied
into the framework.
"""

import importlib.machinery
import sys
import types

REFERENCE_PATH = "/root/reference"

_installed = False


def install_reference():
    """Make `internvl.*` importable on CPU (shims the missing `timm` dep)."""
    global _installed
    if _installed:
        return
    import torch.nn as nn

    # timm is not installed in this image; the reference only uses DropPath
    # (inactive at eval / drop_path_rate=0), so an identity shim suffices.
    timm = types.ModuleType("timm")
    timm.__spec__ = importlib.machinery.ModuleSpec("timm", None)
    m1 = types.ModuleType("timm.models")
    m1.__spec__ = importlib.machinery.ModuleSpec("timm.models", None)
    m2 = types.ModuleType("timm.models.layers")
    m2.__spec__ = importlib.machinery.ModuleSpec("timm.models.layers", None)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    m2.DropPath = DropPath
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = m1
    sys.modules["timm.models.layers"] = m2

    def _module(name, **attrs):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    # decord (C++ video decode) — only VideoReader/cpu are imported at module
    # scope; video tests don't exercise them here.
    _module("decord", VideoReader=object, cpu=lambda *a, **k: None)

    # torchvision.transforms — dataset.py imports it at module scope; the
    # tiling functions under golden test don't touch it.
    class _T:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tv = _module("torchvision")
    tvt = _module(
        "torchvision.transforms",
        Compose=_T, Lambda=_T, Resize=_T, ToTensor=_T, Normalize=_T,
        RandomChoice=_T,
    )
    _module("torchvision.transforms.functional",
            InterpolationMode=types.SimpleNamespace(BICUBIC="bicubic"))
    tv.transforms = tvt

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _installed = True
