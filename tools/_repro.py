"""Shared recorder for the reference-baseline reproductions.

tools/bench_medium.py and tools/bench_airline.py call ``record_repro``
after a run; bench.py embeds the merged file into its one-line JSON so
the per-round BENCH_r{N}.json carries the measured headline ratios vs
BASELINE.md instead of prose claims in SCALE.md.
"""

from __future__ import annotations

import json
import os
import time

REPRO_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BASELINE_REPRO.json",
)


def record_repro(key: str, payload: dict) -> None:
    data: dict = {}
    if os.path.exists(REPRO_PATH):
        try:
            with open(REPRO_PATH) as f:
                data = json.load(f)
        except (OSError, ValueError):
            data = {}
    payload = dict(payload)
    payload["recorded_unix"] = int(time.time())
    data[key] = payload
    with open(REPRO_PATH, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")


def load_repro() -> dict | None:
    if not os.path.exists(REPRO_PATH):
        return None
    try:
        with open(REPRO_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None
