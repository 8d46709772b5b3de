"""wandb adapter with graceful degradation.

The reference logs per-epoch train/val dicts plus a FLOPs/params/throughput
run summary to wandb, gated to rank 0 (reference tools/train.py:243-255,
335-337, 363-364). wandb isn't installed on the air-gapped TPU host, so this
adapter no-ops (with one warning) when the import fails — the same run
configuration works on connected hosts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional


class WandbRun:
    def __init__(self, *, enabled: bool, project: str, name: str,
                 config: Any = None, is_main: bool = True):
        self._run = None
        if not (enabled and is_main):
            return
        try:
            import wandb

            cfg_dict = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else config
            self._run = wandb.init(project=project, name=name, config=cfg_dict)
        except ImportError:
            print("[wandb] not installed — metrics logging to file only")

    def summary(self, values: Dict[str, Any]) -> None:
        if self._run is not None:
            self._run.summary.update(values)

    def log(self, values: Dict[str, Any], step: Optional[int] = None) -> None:
        if self._run is not None:
            self._run.log(values, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
