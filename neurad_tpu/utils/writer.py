"""Metric writers: local console, TensorBoard, W&B (when available).

TPU-native counterpart of `nerfstudio/utils/writer.py` (event queue + wandb/
tensorboard/comet/local backends, EventName 49-59). Pull-based: the trainer calls
`write_scalars(step, dict)` directly — no global event queue needed since the
training loop is single-threaded host-side.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional


class Writer:
    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        raise NotImplementedError

    def write_image(self, step: int, name: str, image) -> None:
        pass

    def close(self) -> None:
        pass


class LocalWriter(Writer):
    """Console table writer (`writer.py` LocalWriter)."""

    def __init__(self, keys: Optional[List[str]] = None):
        self.keys = keys
        self._t0 = time.time()

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        keys = self.keys or [k for k in scalars if not k.startswith("_")]
        parts = [f"step={step}"]
        for k in keys:
            if k in scalars:
                v = scalars[k]
                parts.append(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}")
        print("[train] " + " ".join(parts), flush=True)


class TensorboardWriter(Writer):
    """TensorBoard summary writer (`writer.py` TensorboardWriter)."""

    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter  # torch cpu is in the image

        self._writer = SummaryWriter(log_dir=log_dir)

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        for k, v in scalars.items():
            self._writer.add_scalar(k, v, step)

    def write_image(self, step: int, name: str, image) -> None:
        import numpy as np

        self._writer.add_image(name, np.asarray(image), step, dataformats="HWC")

    def close(self) -> None:
        self._writer.close()


class WandbWriter(Writer):
    """Weights & Biases writer; gated on the wandb package being installed."""

    def __init__(self, project: str = "neurad-tpu", name: Optional[str] = None, **kwargs):
        import wandb  # not in the base image; optional

        self._run = wandb.init(project=project, name=name, **kwargs)

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        self._run.log(scalars, step=step)

    def close(self) -> None:
        self._run.finish()


class MultiWriter(Writer):
    def __init__(self, writers: List[Writer]):
        self.writers = writers

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        for w in self.writers:
            w.write_scalars(step, scalars)

    def write_image(self, step: int, name: str, image) -> None:
        for w in self.writers:
            w.write_image(step, name, image)

    def close(self) -> None:
        for w in self.writers:
            w.close()
