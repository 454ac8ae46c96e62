"""Structured metrics: JSONL stream + console + TensorBoard (SURVEY.md §5.5).

The reference prints loss/KL/win-rate to stdout. Here every iteration emits
one JSON object to `<workdir>/metrics.jsonl` (machine-readable for the
driver), a compact console line, and — when tensorboardX is available —
scalar summaries under `<workdir>/tb/` for TensorBoard. The two north-star
counters — env-steps/s/chip and MCTS sims/s (BASELINE.json:2) — are
first-class fields.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, workdir: Optional[str], quiet: bool = False,
                 tensorboard: bool = True):
        self.quiet = quiet
        self.f = None
        self.tb = None
        if workdir:
            os.makedirs(workdir, exist_ok=True)
            self.f = open(os.path.join(workdir, "metrics.jsonl"), "a",
                          buffering=1)
            if tensorboard:
                try:
                    from tensorboardX import SummaryWriter
                    self.tb = SummaryWriter(os.path.join(workdir, "tb"))
                except Exception:
                    self.tb = None  # tensorboardX optional
        self.t0 = time.time()

    def log(self, record: Dict[str, Any]) -> None:
        record = {"t": round(time.time() - self.t0, 3), **record}
        if self.f:
            self.f.write(json.dumps(record, default=float) + "\n")
        if self.tb is not None and "iter" in record:
            kind = record.get("kind", "iter")
            step = int(record["iter"])
            for k, v in record.items():
                if isinstance(v, (int, float)) and k not in ("iter", "t"):
                    self.tb.add_scalar(f"{kind}/{k}", float(v), step)
        if not self.quiet:
            kind = record.get("kind", "iter")
            keys = [k for k in ("iter", "loss", "policy_loss", "value_loss",
                                "kl_pi_p", "env_steps_per_s", "sims_per_s",
                                "buffer_size", "games_finished", "score",
                                "elo", "anchor_rollouts")
                    if k in record]
            msg = " ".join(f"{k}={_fmt(record[k])}" for k in keys)
            print(f"[{kind}] {msg}", file=sys.stderr)

    def close(self) -> None:
        if self.f:
            self.f.close()
        if self.tb is not None:
            self.tb.close()


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4g}"
    return v
