"""Experiment logging: console + per-experiment file + JSONL metrics.

Reference semantics: the ``log_string`` closure over a logging.FileHandler
(tool/train_cls_scanobjectnn.py:128-162); extended with structured JSONL so
runs are machine-readable.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional


class ExperimentLogger:
    def __init__(self, log_dir: str, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, f"{name}_metrics.jsonl"), "a")
        self.logger = logging.getLogger(f"mpa_tpu.{name}.{id(self)}")
        self.logger.setLevel(logging.INFO)
        self.logger.propagate = False  # avoid double lines via the root logger
        self.logger.handlers.clear()
        fh = logging.FileHandler(os.path.join(log_dir, f"{name}.log"))
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        self.logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter("%(message)s"))
        self.logger.addHandler(sh)

    def info(self, msg: str) -> None:
        self.logger.info(msg)

    def metrics(self, step: int, **kv) -> None:
        rec = {"time": time.time(), "step": step, **kv}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()


def make_logger(log_dir: str, name: str = "train") -> ExperimentLogger:
    return ExperimentLogger(log_dir, name)
