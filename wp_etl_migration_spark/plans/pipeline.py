"""Job DAG: validation, filtering, topological execution (SURVEY §3).

≙ lib/Classes/Pipeline/Pipeline.php:69-221 — build jobs from the YAML
``migration:`` list; validate dependencies (existence, declaration order,
cycles via DFS); skip/include filters (ProcessCommand.php:96-100,217-245);
dry-run (``:145-152``); analyze manifest (``:403-494``).

Execution is driver-side orchestration of Spark actions: each job's
DataFrame is composed lazily by the runner and only materialized by its
sinks — Catalyst optimizes within a job; the DAG orders jobs.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any


class PipelineConfigError(ValueError):
    """Invalid migration config (unknown dependency, cycle, duplicate)."""


@dataclass
class JobConfig:
    """One ``migration:`` list entry."""
    name: str
    extract: dict[str, Any] = field(default_factory=dict)
    transform: list[Any] = field(default_factory=list)
    load: list[dict[str, Any]] = field(default_factory=list)
    depends_on: str | None = None
    skip: bool = False

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "JobConfig":
        return cls(name=d["name"],
                   extract=d.get("extract", {}) or {},
                   transform=d.get("transform", []) or [],
                   load=d.get("load", []) or [],
                   depends_on=d.get("depends_on"),
                   skip=bool(d.get("skip", False)))


def validate_dag(jobs: list[JobConfig]) -> None:
    """Existence, declaration order, and cycle checks
    (≙ Pipeline.php:130-221; cycles via DFS with a grey set)."""
    names = [j.name for j in jobs]
    if len(set(names)) != len(names):
        dup = sorted({n for n in names if names.count(n) > 1})
        raise PipelineConfigError(f"duplicate job name(s): {dup}")
    pos = {n: i for i, n in enumerate(names)}
    deps = {j.name: ([j.depends_on] if j.depends_on else []) for j in jobs}
    for j in jobs:
        if j.depends_on is not None:
            if j.depends_on not in pos:
                raise PipelineConfigError(
                    f"job '{j.name}' depends on unknown job "
                    f"'{j.depends_on}'")
            if pos[j.depends_on] >= pos[j.name]:
                raise PipelineConfigError(
                    f"job '{j.name}' must be declared after its "
                    f"dependency '{j.depends_on}'")
    white, grey, black = set(names), set(), set()

    def dfs(n: str) -> None:
        white.discard(n)
        grey.add(n)
        for d in deps[n]:
            if d in grey:
                raise PipelineConfigError(f"dependency cycle through '{d}'")
            if d in white:
                dfs(d)
        grey.discard(n)
        black.add(n)

    while white:
        dfs(next(iter(white)))


def select_jobs(jobs: list[JobConfig],
                include: list[str] | None = None,
                skip: list[str] | None = None) -> list[JobConfig]:
    """Apply YAML ``skip:`` flags plus CLI include/skip lists
    (≙ ProcessCommand.php:217-245). Unknown names raise."""
    known = {j.name for j in jobs}
    for n in (include or []) + (skip or []):
        if n not in known:
            raise PipelineConfigError(f"unknown job '{n}' in filter")
    out = [j for j in jobs if not j.skip]
    if include:
        out = [j for j in out if j.name in include]
    if skip:
        out = [j for j in out if j.name not in skip]
    return out


@dataclass
class JobReport:
    """≙ the reference's analyze Report (totalRows + wall time,
    ProcessCommand.php:444-465)."""
    name: str
    rows: int
    seconds: float


def write_manifest(reports: list[JobReport], path: str) -> None:
    """Persist the analyze manifest (≙ wp_options cache at
    ProcessCommand.php:469) as JSON."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump({r.name: {"rows": r.rows, "seconds": r.seconds}
                   for r in reports}, f, indent=2)


def timed_count(df) -> tuple[int, float]:
    """Row count + wall-clock (the analyze primitive)."""
    t0 = time.monotonic()
    n = df.count()
    return n, round(time.monotonic() - t0, 3)
