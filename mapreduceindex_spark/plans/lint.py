"""Plan linter: the pre-flight check a query runs BEFORE it ships to a
1000-executor cluster.

``lint_plan(df)`` inspects the physical plan for the anti-patterns that
are invisible at test scale and fatal at 100 TB, returning structured
findings instead of prose:

- ``cartesian``           CartesianProduct — O(N·M) row pairing with
                          BOTH sides shuffled; almost always a missing
                          join condition or a non-equi predicate that
                          should be banded. (BroadcastNestedLoopJoin is
                          deliberately NOT in this rule: a cross join
                          against a broadcast scalar/centroid/model
                          frame is this engine's sanctioned pattern —
                          cosine_topk, IVF probes, bounds literals.)
- ``row_python``          BatchEvalPython — row-at-a-time Python UDF in
                          the plan; ~10-100× slower than Arrow-batched
                          Pandas stages and breaks whole-stage codegen.
- ``global_window``       a window function whose spec has NO partition
                          keys — Spark moves every row to one task
                          (the WindowExec "No Partition Defined"
                          warning, formalized). Bounded metadata frames
                          are fine; flag carries the spec text so the
                          caller can allowlist those.
- ``unpushed_filter``     a parquet scan with data filters that did NOT
                          reach the reader (``PushedFilters: []`` while
                          ``DataFilters`` is non-empty) — the scan reads
                          everything and filters late.

The same regex probes back the repo's committed plan audit
(``scripts/plan_report.py`` → PLANS.md); this module makes them a
library call so pipelines can gate on them in CI. Detection is
necessarily textual — Spark exposes finalized physical plans as
strings — but every pattern is pinned by a positive AND a negative
test against real plans (tests/test_plan_lint.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    rule: str
    detail: str


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_stats(df: DataFrame) -> dict:
    """Count the plan features that decide scale behavior (the
    PLANS.md audit columns) for one DataFrame."""
    plan = _plan_text(df)
    return {
        "exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "range_exchanges": len(
            re.findall(r"Exchange rangepartitioning", plan)
        ),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj_or_shj": len(
            re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)
        ),
        "python_stages": len(
            re.findall(
                r"MapInPandas|FlatMapCoGroupsInPandas"
                r"|FlatMapGroupsInPandas|ArrowEvalPython",
                plan,
            )
        ),
    }


def lint_plan(df: DataFrame) -> list[Finding]:
    """Return scale-anti-pattern findings for ``df``'s physical plan
    (empty list = clean). See module docstring for the rule set."""
    plan = _plan_text(df)
    findings: list[Finding] = []

    for m in re.finditer(r"CartesianProduct", plan):
        findings.append(Finding("cartesian", m.group(0)))
    for m in re.finditer(r"BatchEvalPython \[([^\]]*)", plan):
        findings.append(Finding("row_python", m.group(1)))

    # windowspecdefinition(<partition cols...,> <order> ASC|DESC ...):
    # an unpartitioned spec starts with an ordered column immediately —
    # i.e. the text between '(' and the first ASC/DESC marker contains
    # exactly one expression. Partitioned specs list partition keys
    # (no sort direction) before the ordered ones.
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        first = spec.split(",")[0].strip()
        if " ASC" in first or " DESC" in first:
            findings.append(Finding("global_window", spec[:120]))

    # scans where no SELECTIVE predicate reached the parquet reader:
    # Spark pushes the derived IsNotNull even when the real predicate
    # (an expression over a column) cannot push, so "PushedFilters
    # non-empty" is not evidence of pushdown — strip the IsNotNull noise
    # from both lists before comparing.
    for m in re.finditer(
        r"DataFilters: \[([^\]]*)\].*?PushedFilters: \[([^\]]*)\]", plan
    ):
        data = [
            f.strip()
            for f in m.group(1).split(",")
            if f.strip() and not f.strip().lower().startswith("isnotnull")
        ]
        pushed = [
            f.strip()
            for f in m.group(2).split(",")
            if f.strip() and not f.strip().startswith("IsNotNull")
        ]
        if data and not pushed:
            findings.append(Finding("unpushed_filter", m.group(1)[:120]))

    return findings
