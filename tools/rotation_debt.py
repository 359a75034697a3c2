#!/usr/bin/env python3
"""Rotation-debt accounting for the driver CORRECTNESS gate
(VERDICT r10 #4).

The driver records at most 50 CORRECTNESS rows per round — the
queries in ``_DRIVER_ROWS`` (``wp_etl_migration_spark/queries.py``).
Every other registry query is only locally parity-checked, so its
last *driver* witness ages one round per round. The judge flags any
query whose last driver witness is older than ``MAX_AGE`` rounds.

This tool replaces the hand-computed audit: it parses every committed
``CORRECTNESS_r*.json``, computes each query's last green witness
round, projects each query's age at the end of the NEXT driver round
under the CURRENT ``_DRIVER_ROWS`` (a selected query is re-witnessed
=> age 0; an unselected one ages to ``next_round - last_witness``),
prints the table, and exits non-zero when any projected age exceeds
``MAX_AGE`` — i.e. when the current rotation choice would create
judge-visible debt. Run with ``--table`` for the full per-query
listing; the default output is the summary plus violations.

A green witness = rows+schema match, hash match (or no hash oracle),
no error. Queries present in history but no longer registered are
ignored; a registered query with NO witness ever must be in
``_DRIVER_ROWS`` (it has unbounded debt until first witnessed).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

MAX_AGE = 2

#: Bench-only composed journeys (oracle None, multi-sink side
#: effects): the driver never runs them as CORRECTNESS rows — their
#: witness is the pinned-golden contract twin that replays the same
#: pipeline and IS driver-oracled. Their age is the twin's age.
CONTRACT_TWINS = {
    "wp_post_all": "wp_post_all_contract",
    "training_prep_all": "training_prep_contract",
}

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_witness_rounds(root: str = _ROOT) -> tuple[dict[str, int], int]:
    """(query -> last green driver-witness round, latest round seen)."""
    last: dict[str, int] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(root,
                                              "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            green = (row.get("rows_match") and row.get("schema_match")
                     and row.get("hash_match") in (True, None)
                     and not row.get("err"))
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last, latest


def projected_ages(root: str = _ROOT) -> tuple[dict[str, int], int]:
    """query -> projected age at the end of the next driver round,
    under the current ``_DRIVER_ROWS``. Never-witnessed unselected
    queries get a sentinel age of 10**6."""
    if root not in sys.path:
        sys.path.insert(0, root)
    from wp_etl_migration_spark.queries import _ALL_QUERIES, _DRIVER_ROWS
    last, latest = last_witness_rounds(root)
    nxt = latest + 1
    selected = set(_DRIVER_ROWS)
    ages: dict[str, int] = {}
    for name in _ALL_QUERIES:
        probe = CONTRACT_TWINS.get(name, name)
        if probe in selected:
            ages[name] = 0
        elif probe in last:
            ages[name] = nxt - last[probe]
        else:
            ages[name] = 10**6
    return ages, nxt


def main(argv: list[str]) -> int:
    show_table = "--table" in argv
    ages, nxt = projected_ages()
    last, _ = last_witness_rounds()
    bad = {n: a for n, a in ages.items() if a > MAX_AGE}
    if show_table:
        width = max(len(n) for n in ages)
        for name in sorted(ages, key=lambda n: (-ages[n], n)):
            mark = " <-- DEBT" if name in bad else ""
            print(f"{name:<{width}}  last=r{last.get(name, '-')}"
                  f"  age@r{nxt}={ages[name]}{mark}")
    dist: dict[int, int] = {}
    for a in ages.values():
        dist[a] = dist.get(a, 0) + 1
    print(f"rotation debt @r{nxt}: {len(ages)} registry queries, "
          f"age distribution {dict(sorted(dist.items()))}, "
          f"max allowed {MAX_AGE}")
    if bad:
        for name in sorted(bad):
            probe = CONTRACT_TWINS.get(name, name)
            lw = last.get(probe)
            src = f"last witness r{lw}" if lw else "NEVER witnessed"
            via = f" (via {probe})" if probe != name else ""
            print(f"DEBT: {name} projected age {bad[name]} "
                  f"({src}{via}) — add {probe} to _DRIVER_ROWS",
                  file=sys.stderr)
        return 1
    print("OK: no query's projected driver-witness age exceeds "
          f"{MAX_AGE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
