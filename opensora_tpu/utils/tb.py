"""TensorBoard writer (reference utils/misc.py:20-33 create_tensorboard_writer
+ wandb dict logging in scripts/diffusion/train.py:576-591).

wandb is not baked into TPU images; tensorboardX is, so tensorboard is the
default sink and the wandb hook is gated."""

from __future__ import annotations

import os
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, exp_dir: str, use_wandb: bool = False, config: Optional[dict] = None):
        self._tb = None
        self._wandb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(os.path.join(exp_dir, "tb"))
        except Exception:
            pass
        if use_wandb:
            try:
                import wandb

                wandb.init(project="opensora_tpu", dir=exp_dir, config=config)
                self._wandb = wandb
            except Exception:
                pass

    def log(self, metrics: Dict[str, float], step: int):
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
