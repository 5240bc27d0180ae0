"""Metrics / observability (SURVEY.md section 5.5): JSON-lines emission of
sampler health — acceptance rates, step sizes, divergence counts, per-window
throughput, cross-chain R-hat/ESS.  The reference prints nothing; ESS/sec is
this rebuild's north-star metric so it is first-class here."""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional

import numpy as np

__all__ = ["MetricsLogger", "chain_health"]


class MetricsLogger:
    """Emit one JSON line per event to a stream (default stderr) and keep an
    in-memory history.  Cheap enough to call once per driver chunk."""

    def __init__(self, stream: Optional[IO] = None, run_id: str = ""):
        self.stream = stream if stream is not None else sys.stderr
        self.run_id = run_id
        self.history = []
        self._t0 = time.time()

    def log(self, event: str, **fields):
        rec = {"t": round(time.time() - self._t0, 3), "event": event}
        if self.run_id:
            rec["run"] = self.run_id
        for k, v in fields.items():
            if isinstance(v, (np.generic, np.ndarray)):
                v = np.asarray(v).tolist()
            rec[k] = v
        self.history.append(rec)
        try:
            self.stream.write(json.dumps(rec) + "\n")
            self.stream.flush()
        except Exception:
            pass
        return rec


def chain_health(draws: dict, params=None) -> dict:
    """Cross-chain diagnostics summary: R-hat, ESS, divergence rate."""
    from pynngp_tpu.diagnostics import ess, split_rhat

    out = {}
    params = params or [
        k for k in draws if k not in ("diverging", "w", "beta", "loglik", "logpost")
    ]
    for name in params:
        v = np.asarray(draws[name], np.float64)
        out[name] = {
            "ess": ess(v),
            "rhat": split_rhat(v) if v.ndim == 2 and v.shape[0] > 1 else float("nan"),
        }
    if "diverging" in draws:
        out["divergence_rate"] = float(np.asarray(draws["diverging"]).mean())
    return out
