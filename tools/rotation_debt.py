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
round, and audits in one of two MODES depending on where the round
cycle stands (detectable from the history itself):

- **pending** (the committed window has NOT yet produced this round's
  CORRECTNESS file — i.e. the window's green query set differs from
  the latest file's): project each query's age at the end of the
  NEXT driver run under the committed ``_DRIVER_ROWS`` (selected ⇒
  re-witnessed ⇒ age 0; unselected ⇒ ``next_round − last_witness``)
  and fail if any projection exceeds ``MAX_AGE``. This is the mode
  that vets a fresh rotation edit before the driver runs it.
- **ran** (the latest CORRECTNESS file IS the committed window's run):
  projecting one round ahead would demand NEXT round's rotation edit
  prematurely (rotation legitimately happens at the next round's
  start), so instead assert the invariant that actually holds between
  rounds: no query's CURRENT age (``latest − last_witness``) exceeds
  ``MAX_AGE``. A skipped rotation still fails — one round later, when
  the un-rotated window's new CORRECTNESS file makes the stale rows'
  current age exceed the limit.

Run with ``--table`` for the full per-query listing; the default
output is the summary plus violations. Exit ≠ 0 on debt.

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
    last, _seen, latest = _witness_history(root)
    return last, latest


def _witness_history(root: str = _ROOT) -> tuple[dict[str, int],
                                                 set[str], int]:
    """(query -> last GREEN witness round, queries seen in ANY file
    green or red, latest round seen). The seen-set distinguishes a
    brand-new query (never ran — selection is enough) from one that
    ran and failed (selection alone must not reset its debt)."""
    last: dict[str, int] = {}
    seen: set[str] = set()
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
        seen.update(rows)
        for name, row in rows.items():
            green = (row.get("rows_match") and row.get("schema_match")
                     and row.get("hash_match") in (True, None)
                     and not row.get("err"))
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last, seen, latest


def _latest_row_set(root: str = _ROOT) -> set[str]:
    """ALL query names in the newest CORRECTNESS file (green or not).

    Mode detection keys on this, not the green subset (r11 ADVICE): a
    window whose run produced a RED row is still a window that RAN —
    keying on greens would bounce the audit back to pending mode,
    where the failing-but-selected row projects to age 0 forever and
    its staleness is never surfaced."""
    paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
                   key=lambda p: int(re.search(r"_r(\d+)\.json$",
                                               p).group(1)))
    if not paths:
        return set()
    with open(paths[-1]) as fh:
        rows = json.load(fh)
    return set(rows)


def audit(root: str = _ROOT) -> tuple[str, dict[str, int], int]:
    """(mode, query -> age, round the ages refer to).

    mode "ran": the committed window's run IS the latest CORRECTNESS
    file; ages are CURRENT (latest − last_witness) — the between-round
    invariant. mode "pending": the window has not run yet; ages are
    PROJECTED to the next round under the committed window (selected ⇒
    0 — but a selected query whose last green witness is ALREADY past
    the limit keeps its real stale age rather than an optimistic 0:
    selection is a plan to re-witness, and a query that keeps failing
    in the driver is selected every round without ever turning green,
    so projecting 0 would hide unbounded staleness — the r11 ADVICE
    hole). Never-witnessed, unselected queries get a 10**6 sentinel in
    either mode."""
    if root not in sys.path:
        sys.path.insert(0, root)
    from wp_etl_migration_spark.queries import _ALL_QUERIES, _DRIVER_ROWS
    last, seen, latest = _witness_history(root)
    selected = set(_DRIVER_ROWS)
    ran = selected <= _latest_row_set(root)
    ref = latest if ran else latest + 1
    ages: dict[str, int] = {}
    for name in _ALL_QUERIES:
        probe = CONTRACT_TWINS.get(name, name)
        if not ran and probe in selected:
            if probe in last:
                # Selection projects 0 only while the last GREEN
                # witness is within the limit; a selected query whose
                # witness is already stale has been failing in the
                # driver and keeps its real age (r11 ADVICE).
                stale = ref - last[probe]
                ages[name] = 0 if stale <= MAX_AGE + 1 else stale
            else:
                # Never green: brand-new (never ran) → selection is
                # the plan, 0; ran-and-always-red → unbounded debt.
                ages[name] = 10**6 if probe in seen else 0
        elif probe in last:
            ages[name] = ref - last[probe]
        else:
            # ran mode, never green: selected + never even attempted
            # → freshly registered, no debt yet; anything else
            # (unselected, or selected but red whenever it ran) is
            # unbounded debt.
            ages[name] = (0 if (ran and probe in selected
                                and probe not in seen) else 10**6)
    return ("ran" if ran else "pending"), ages, ref


def projected_ages(root: str = _ROOT) -> tuple[dict[str, int], int]:
    """Back-compat shim: audit()'s ages + reference round."""
    _mode, ages, ref = audit(root)
    return ages, ref


def main(argv: list[str]) -> int:
    show_table = "--table" in argv
    mode, ages, ref = audit()
    last, _ = last_witness_rounds()
    bad = {n: a for n, a in ages.items() if a > MAX_AGE}
    if show_table:
        width = max(len(n) for n in ages)
        for name in sorted(ages, key=lambda n: (-ages[n], n)):
            mark = " <-- DEBT" if name in bad else ""
            print(f"{name:<{width}}  last=r{last.get(name, '-')}"
                  f"  age@r{ref}={ages[name]}{mark}")
    dist: dict[int, int] = {}
    for a in ages.values():
        dist[a] = dist.get(a, 0) + 1
    print(f"rotation debt @r{ref} ({mode} window): {len(ages)} "
          f"registry queries, age distribution "
          f"{dict(sorted(dist.items()))}, max allowed {MAX_AGE}")
    if bad:
        for name in sorted(bad):
            probe = CONTRACT_TWINS.get(name, name)
            lw = last.get(probe)
            src = f"last witness r{lw}" if lw else "NEVER witnessed"
            via = f" (via {probe})" if probe != name else ""
            print(f"DEBT: {name} age {bad[name]} "
                  f"({src}{via}) — add {probe} to _DRIVER_ROWS",
                  file=sys.stderr)
        return 1
    print(f"OK ({mode} window): no query's driver-witness age "
          f"exceeds {MAX_AGE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
