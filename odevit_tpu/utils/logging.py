"""Metric logging: wandb-compatible surface, local-first.

The reference logs everything to Weights & Biases (train.py:89-106,
test.py:166-167). wandb isn't in this image, so ``MetricLogger`` exposes
the same ``.log(dict)`` / ``.watch(...)`` / ``.finish()`` surface and
writes JSONL to ``runs/<name>/metrics.jsonl`` (plus the config snapshot);
if wandb IS importable and ``use_wandb=True`` it mirrors every call there.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def _to_scalar(v: Any) -> Any:
    try:
        import numpy as np
        if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
            return v.item()
        if isinstance(v, (np.floating, np.integer)):
            return v.item()
    except Exception:
        pass
    return v


class MetricLogger:
    def __init__(self, project: str = "odevit", group: str = "",
                 name: Optional[str] = None, config: Optional[dict] = None,
                 root: str = "runs", use_wandb: bool = False):
        self.name = name or f"run-{int(time.time())}"
        self.dir = os.path.join(root, self.name)
        os.makedirs(self.dir, exist_ok=True)
        self._fh = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._step = 0
        if config:
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, group=group,
                                         name=name, config=config)
            except Exception as e:      # wandb not installed / offline
                print(f"[logging] wandb unavailable ({e}); local JSONL only")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = {k: _to_scalar(v) for k, v in metrics.items()
               if not isinstance(v, dict)}
        rec["_step"] = self._step if step is None else step
        rec["_time"] = time.time()
        self._fh.write(json.dumps(rec, default=str) + "\n")
        self._fh.flush()
        self._step += 1
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def watch(self, *args, **kwargs):
        if self._wandb is not None:
            self._wandb.watch(*args, **kwargs)

    def finish(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()

    # truthiness mirrors the reference's `if wandb_logger:` gates
    def __bool__(self):
        return True
