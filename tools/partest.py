#!/usr/bin/env python
"""Parallel suite runner (VERDICT r12 #7): the serial suite wall grew
to ~28 min; each test FILE is an independent pytest process (its own
SparkSession at local[8]), so a small process pool restores a
~sum/workers wall on the 32-core box without pytest-xdist (not baked
into the container).

Task split:
- every ``tests/test_*.py`` file runs as one task, EXCEPT
- ``test_oracle_parity.py`` — the suite's largest single block —
  splits into ``--parity-shards`` row-disjoint tasks via the
  committed ``PARITY_SHARD=i/N`` mechanism (r11 #8) plus one task
  for its non-parity rows.

Scheduling is longest-first over a committed weight table (measured
serial walls, r13 box — unknown files default to 60 s), which keeps
the long poles (streaming, goldens, parity shards) from landing on
one worker at the tail.

Run:  python tools/partest.py [--workers 4] [--parity-shards 4]

Prints one JSON line: per-task walls + rc, the wall of the whole run,
and fails (exit 1) if ANY task fails — same green/red contract as
``pytest tests/``. Worker count trades isolation for speed only; task
processes share nothing but the read-only testdata."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Measured per-task walls under 4-way contention (seconds, r13 box,
#: from this tool's own JSON) — scheduling hints only; a missing
#: entry costs scheduling efficiency, never correctness.
WEIGHTS = {
    "test_store_soaks.py": 280,
    "test_incremental_store.py": 220,
    "test_streaming_ann.py": 188,
    "test_streaming.py": 60,
    "test_oracle_parity.py": 247,     # per-shard weight is /= shards
    "test_examples.py": 185,
    "test_properties.py": 131,
    "test_scale_tools.py": 127,
    "test_graph.py": 123,
    "test_sinks.py": 106,
    "test_plan_audit.py": 102,
    "test_plan_equivalence.py": 64,
    "test_skewed_corpus.py": 63,
    "test_urls.py": 62,
    "test_sampling.py": 39,
    "test_temporal.py": 38,
    "test_training_prep_all.py": 37,
    "test_jdbc.py": 36,
    "test_bpe.py": 33,
}


def main(argv: list[str]) -> int:
    def _flag(name: str, default: int) -> int:
        if name in argv:
            try:
                return int(argv[argv.index(name) + 1])
            except (IndexError, ValueError):
                print(json.dumps({"error": f"{name} needs an int"}))
                raise SystemExit(2)
        return default

    workers = _flag("--workers", 4)
    shards = _flag("--parity-shards", 4)

    files = sorted(os.path.basename(p) for p in
                   glob.glob(os.path.join(_ROOT, "tests", "test_*.py")))
    tasks: list[tuple[float, str, list[str], dict]] = []
    for f in files:
        path = os.path.join("tests", f)
        if f == "test_oracle_parity.py":
            for i in range(shards):
                tasks.append((WEIGHTS[f] / shards + 30,
                              f"parity {i}/{shards}",
                              [path, "-m", "parity"],
                              {"PARITY_SHARD": f"{i}/{shards}"}))
            tasks.append((30, "parity-meta",
                          [path, "-m", "not parity"], {}))
        else:
            tasks.append((WEIGHTS.get(f, 60), f, [path], {}))
    tasks.sort(key=lambda t: -t[0])

    def run(task):
        _w, label, args, extra_env = task
        env = dict(os.environ, **extra_env)
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             *args],
            cwd=_ROOT, env=env, capture_output=True, text=True)
        wall = round(time.monotonic() - t0, 1)
        tail = (proc.stdout or "").strip().splitlines()[-1:] or [""]
        return {"task": label, "rc": proc.returncode, "wall": wall,
                "tail": tail[0][:200],
                **({} if proc.returncode == 0 else
                   {"stdout_tail": proc.stdout[-2000:],
                    "stderr_tail": proc.stderr[-1000:]})}

    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=workers) as pool:
        results = list(pool.map(run, tasks))
    failed = [r for r in results if r["rc"] != 0]
    print(json.dumps({
        "metric": "parallel_suite_wall",
        "value": round(time.monotonic() - t0, 1),
        "unit": "sec", "workers": workers,
        "tasks": [{k: r[k] for k in ("task", "rc", "wall", "tail")}
                  for r in results],
        "failed": [r for r in failed]}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
