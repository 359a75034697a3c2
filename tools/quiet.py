#!/usr/bin/env python
"""Pre-bench quiet gate: are all three ambience referees near their
committed references RIGHT NOW?

Prints one JSON line with the three canary ratios
(see ``bench.py`` / BASELINE.md's interpretation rule) and exits 0
when every ratio is at or under its threshold — the discipline the
r12 ambience study showed matters: floors are composite quiet-window
minimums, so benching on a loud window measures the neighbors, not
the code. Usage::

    python tools/quiet.py && python bench.py            # gate a run
    python tools/quiet.py --cpu 1.1 --io 1.2 --mem 1.2  # custom bars

Thresholds default to {cpu 1.08, io 1.15, mem 1.15}: the spreads the
r12 round observed between honestly-quiet windows and windows whose
boards read 1.3×+. A missing committed reference skips that referee
(reported as null).
"""

from __future__ import annotations

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str]) -> int:
    sys.path.insert(0, _ROOT)
    import bench

    bars = {"cpu": 1.08, "io": 1.15, "mem": 1.15}
    # One real parser pass: both `--cpu 1.1` and `--cpu=1.1` forms,
    # structured errors for trailing/non-numeric values AND for
    # unknown arguments — a typo'd flag used to be silently ignored,
    # gating the run on defaults the caller thought they overrode
    # (ADVICE r12/r13; one-JSON-line contract either way).
    i = 0
    while i < len(argv):
        a = argv[i]
        key, _, inline = a.partition("=")
        key = key.lstrip("-")
        if not a.startswith("--") or key not in bars:
            print(json.dumps({"error": f"unknown argument {a!r}; "
                                       "usage: quiet.py [--cpu X] "
                                       "[--io X] [--mem X]"}))
            return 2
        if not inline:
            if i + 1 >= len(argv):
                print(json.dumps({"error": f"--{key} needs a numeric "
                                           f"value, e.g. --{key} 1.1"}))
                return 2
            inline = argv[i + 1]
            i += 1
        try:
            bars[key] = float(inline)
        except ValueError:
            print(json.dumps({"error": f"--{key} needs a numeric "
                                       f"value, got {inline!r}"}))
            return 2
        i += 1

    base_path = os.path.join(_ROOT, "baseline_queries.json")
    refs = {}
    if os.path.exists(base_path):
        with open(base_path) as fh:
            base = json.load(fh)
        refs = {"cpu": base.get("canary_sec"),
                "io": base.get("io_canary_sec"),
                "mem": base.get("mem_canary_sec")}

    try:
        now = {"cpu": bench.canary_sec(),
               "io": bench.io_canary_sec(),
               "mem": bench.mem_canary_sec()}
    except RuntimeError as exc:
        # A dead/stalled canary means the box is NOT quiet (or is
        # OOM-killing 64 MiB workers) — fail structured, never hang.
        print(json.dumps({"quiet": False, "error": str(exc)[:300]}))
        return 1
    ratios = {k: (round(now[k] / refs[k], 3) if refs.get(k) else None)
              for k in now}
    quiet = all(r is None or r <= bars[k] for k, r in ratios.items())
    print(json.dumps({"quiet": quiet, "ratios": ratios, "bars": bars}))
    return 0 if quiet else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
