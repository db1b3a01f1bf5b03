"""Structured training-metrics logging (JSONL).

Beyond-reference observability: the reference logs training progress only
as prints (`atomai/trainers/trainer.py:360-395` print_statistics) and
end-of-run matplotlib curves. Production training wants a machine-readable
stream a dashboard/tail can follow while the run is live, so every trainer
accepts ``metrics_log="run.jsonl"`` and appends one JSON object per cycle:

    {"cycle": 17, "wall_s": 12.93, "train_loss": ..., "test_loss": ...}

Lines are flushed per chunk (the compiled-scan print interval), so a
``tail -f`` shows progress at the same cadence as the console prints.
"""

import json
import time
from typing import Optional


class MetricsLogger:
    """Append-only JSONL metric stream; one object per training cycle."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, cycle: int, **metrics) -> None:
        rec = {"cycle": int(cycle),
               "wall_s": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            if v is None:
                continue
            rec[k] = float(v)
        self._fh.write(json.dumps(rec) + "\n")

    def log_many(self, first_cycle: int, **series) -> None:
        """Logs aligned per-cycle series (the scan engine materializes a
        chunk of cycles at once)."""
        arrays = {k: v for k, v in series.items() if v is not None}
        if not arrays:
            return
        n = min(len(v) for v in arrays.values())
        for i in range(n):
            self.log(first_cycle + i,
                     **{k: v[i] for k, v in arrays.items()})

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def open_metrics_log(path: Optional[str]) -> Optional[MetricsLogger]:
    return MetricsLogger(path) if path else None
