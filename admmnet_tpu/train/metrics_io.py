"""Structured metric logging (SURVEY.md section 5).

The reference dumps a history dict to training_history.json once per epoch
(reference train.py:324-327) and a final test_result.json (train.py:429-440).
This writer keeps those files AND an append-only JSONL stream
(``metrics.jsonl``) so curves survive crashes mid-epoch and external tools
can tail progress.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict


class MetricsWriter:
    def __init__(self, workdir):
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = self.workdir / "metrics.jsonl"

    def log(self, kind: str, **metrics: Any) -> None:
        rec = {"kind": kind, "time": time.time(), **metrics}
        with open(self._jsonl, "a") as fp:
            fp.write(json.dumps(rec) + "\n")

    def write_history(self, history: Dict[str, list]) -> None:
        with open(self.workdir / "training_history.json", "w") as fp:
            json.dump(history, fp, indent=2)

    def write_test_result(self, metrics: Dict[str, float]) -> None:
        with open(self.workdir / "test_result.json", "w") as fp:
            json.dump(metrics, fp, indent=2)

    def read_jsonl(self):
        if not self._jsonl.exists():
            return []
        return [
            json.loads(line)
            for line in self._jsonl.read_text().splitlines()
            if line.strip()
        ]
