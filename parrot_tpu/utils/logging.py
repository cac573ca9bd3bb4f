"""JSONL metrics stream + stdout printing.

Rebuilds Blocks' TrainingDataMonitoring / DataStreamMonitoring / Printing
extension output (SURVEY.md §5 "Metrics / logging"): one JSON object per
event appended to <save_dir>/<model>/metrics.jsonl, mirrored to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, save_dir: str, model_name: str, quiet: bool = False,
                 write_file: bool = True):
        """write_file=False keeps stdout mirroring but skips the JSONL —
        used by multi-host processes > 0 so concurrent appends from a
        shared filesystem can't interleave records."""
        root = os.path.join(save_dir, model_name)
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1) if write_file else None
        self.quiet = quiet
        self._t0 = time.time()

    def log(self, kind: str, step: int, **values):
        rec = {"kind": kind, "step": step,
               "wall": round(time.time() - self._t0, 3)}
        for k, v in values.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._f is not None:
            self._f.write(json.dumps(rec) + "\n")
        if not self.quiet:
            body = " ".join(f"{k}={rec[k]:.5g}" if isinstance(rec[k], float)
                            else f"{k}={rec[k]}" for k in values)
            print(f"[{kind}] step={step} {body}", file=sys.stdout, flush=True)

    def close(self):
        if self._f is not None:
            self._f.close()
