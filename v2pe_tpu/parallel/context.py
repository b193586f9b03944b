"""Ambient sharding context.

The model code stays mesh-agnostic; the trainer/eval harness activates a
ShardingContext and every flash_attention call routes through the shard_map
wrapper (ring attention when the seq axis is >1). This replaces the
reference's module-global ``local_group`` plumbing
(modeling_internlm2.py:1678-1685)."""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional, Tuple

from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class ShardingContext:
    mesh: Mesh
    batch_axes: Tuple[str, ...] = ("data", "fsdp")
    seq_axis: str = "seq"
    tensor_axis: str = "tensor"
    pipe_axis: str = "pipe"
    pipe_microbatches: int = 0  # 0 = auto (parallel/pipeline.py)
    ring_mode: str = "scan"  # 'scan' (2-slot ppermute ring, memory-lean) |
    # 'fused' (in-kernel RDMA streaming, parallel/ring_fused.py — fastest,
    # holds the full gathered KV per device)

    @property
    def seq_shards(self) -> int:
        return self.mesh.shape[self.seq_axis]

    @property
    def pipe_shards(self) -> int:
        """Size of the pipeline axis; meshes without one count as 1."""
        return dict(self.mesh.shape).get(self.pipe_axis, 1)


_CURRENT: Optional[ShardingContext] = None


def current() -> Optional[ShardingContext]:
    return _CURRENT


@contextlib.contextmanager
def use_sharding(ctx: Optional[ShardingContext]):
    global _CURRENT
    prev = _CURRENT
    _CURRENT = ctx
    try:
        yield ctx
    finally:
        _CURRENT = prev
