"""Training metrics sinks.

The reference logs through the HF Trainer's report_to stack
(tensorboard/wandb, ``internvl_chat_finetune.py`` TrainingArguments). Here a
sink is just a ``metrics_hook`` for ``train.trainer.train``:

* :class:`JsonlMetricsSink` — always available; one JSON object per logged
  step, greppable and resume-safe (append mode);
* :class:`TensorBoardMetricsSink` — scalars via torch's SummaryWriter when
  torch is importable (it is in this image; no TF dependency);
* :func:`build_metrics_hook` — fan-out over whichever sinks are requested,
  returned as a single callable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable, Optional


class JsonlMetricsSink:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def __call__(self, step: int, metrics: dict) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class TensorBoardMetricsSink:
    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter

        self._w = SummaryWriter(log_dir=log_dir)

    def __call__(self, step: int, metrics: dict) -> None:
        for k, v in metrics.items():
            self._w.add_scalar(f"train/{k}", float(v), step)
        self._w.flush()

    def close(self) -> None:
        self._w.close()


def build_metrics_hook(
    output_dir: str,
    report_to: Iterable[str] = ("jsonl",),
    extra_hook: Optional[Callable[[int, dict], None]] = None,
) -> Callable[[int, dict], None]:
    """Compose sinks. report_to: subset of {'jsonl', 'tensorboard'} —
    unknown names raise; a missing tensorboard backend degrades to jsonl
    with a warning rather than failing the run.

    Multi-host: only process 0 writes (the HF rank-0 ``report_to``
    behavior) — on a shared filesystem every process appending to the same
    metrics.jsonl/TensorBoard dir would interleave duplicate records. An
    ``extra_hook`` still runs on every process (callers gate it themselves
    if needed)."""
    import logging

    try:
        import jax

        is_proc0 = jax.process_index() == 0
    except Exception:
        is_proc0 = True

    sinks = []
    if not is_proc0:
        report_to = ()
    for name in report_to:
        if name == "jsonl":
            sinks.append(JsonlMetricsSink(
                os.path.join(output_dir, "metrics.jsonl")))
        elif name == "tensorboard":
            try:
                sinks.append(TensorBoardMetricsSink(
                    os.path.join(output_dir, "tb")))
            except ImportError:
                logging.getLogger(__name__).warning(
                    "tensorboard unavailable; logging metrics to jsonl only")
                if not any(isinstance(s, JsonlMetricsSink) for s in sinks):
                    sinks.append(JsonlMetricsSink(
                        os.path.join(output_dir, "metrics.jsonl")))
        elif name == "none":
            pass
        else:
            raise ValueError(f"unknown metrics sink {name!r}")
    if extra_hook:
        sinks.append(extra_hook)

    def hook(step: int, metrics: dict) -> None:
        for s in sinks:
            s(step, metrics)

    return hook
