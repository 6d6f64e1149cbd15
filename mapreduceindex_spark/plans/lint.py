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
                          keys — both the ordered form (rank over the
                          whole table) and the unordered whole-table
                          frame (sum over ``partitionBy()``) — Spark
                          moves every row to one task (the WindowExec
                          "No Partition Defined" warning, formalized).
                          Bounded metadata frames are fine; the finding
                          carries the spec text so callers can
                          allowlist those.
- ``unpushed_filter``     a parquet scan with selective data filters
                          none of which reached the reader (Spark
                          pushes derived IsNotNulls even when the real
                          predicate cannot push, so IsNotNull noise is
                          stripped from both lists before comparing) —
                          the scan reads everything and filters late.

``scripts/plan_report.py`` (→ the committed PLANS.md audit) builds on
``stats_from_text`` from this module, so the CI gate and the committed
audit cannot drift apart. Detection is necessarily textual — Spark
exposes finalized physical plans as strings — but every pattern is
pinned by a positive AND a negative test against real plans
(tests/test_plan_lint.py), and the scan-metadata parse is line-scoped
so Spark's ``maxMetadataStringLength`` truncation (which can eat a
closing bracket) cannot make one field's regex swallow another's.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

#: Arrow-batched Python stages (the sanctioned kind — still worth
#: counting: each is a JVM↔Arrow boundary and a codegen break).
ARROW_STAGES = (
    r"MapInPandas|FlatMapCoGroupsInPandas|FlatMapGroupsInPandasWithState"
    r"|FlatMapGroupsInPandas|ApplyInPandasWithState|WindowInPandas"
    r"|AggregateInPandas|ArrowEvalPython|MapInArrow|PythonMapInArrow"
)


@dataclass(frozen=True)
class Finding:
    rule: str
    detail: str


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def stats_from_text(plan: str) -> dict:
    """Count the plan features that decide scale behavior (the
    PLANS.md audit columns) from a physical-plan string."""
    return {
        "exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "range_exchanges": len(
            re.findall(r"Exchange rangepartitioning", plan)
        ),
        "broadcast_joins": len(
            re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)
        ),
        "smj_or_shj": len(
            re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)
        ),
        "python_stages": len(re.findall(ARROW_STAGES, plan)),
        "python_udf_rows": len(re.findall(r"BatchEvalPython", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
    }


def plan_stats(df: DataFrame) -> dict:
    """``stats_from_text`` over ``df``'s finalized physical plan."""
    return stats_from_text(_plan_text(df))


def _scan_fields(line: str, field: str) -> list[str] | None:
    """Extract a FileScan metadata list from ONE plan line, tolerating
    Spark's maxMetadataStringLength truncation (the closing ']' may
    have been replaced by '...'). Returns None if the field is absent,
    else the comma-split entries with IsNotNull noise removed."""
    m = re.search(field + r": \[([^\]\n]*)(?:\]|\.\.\.)", line)
    if m is None:
        return None
    return [
        f.strip()
        for f in m.group(1).split(",")
        if f.strip() and not f.strip().lower().startswith("isnotnull")
    ]


def lint_plan(df: DataFrame) -> list[Finding]:
    """Return scale-anti-pattern findings for ``df``'s physical plan
    (empty list = clean). See module docstring for the rule set."""
    plan = _plan_text(df)
    findings: list[Finding] = []

    for line in plan.splitlines():
        stripped = line.strip(" :+-*(0123456789)")
        if "CartesianProduct" in line:
            findings.append(Finding("cartesian", stripped[:120]))
        if "BatchEvalPython" in line:
            findings.append(Finding("row_python", stripped[:120]))
        if "FileScan" in line:
            data = _scan_fields(line, "DataFilters")
            pushed = _scan_fields(line, "PushedFilters")
            if data and pushed is not None and not pushed:
                findings.append(
                    Finding("unpushed_filter", ", ".join(data)[:120])
                )

    # windowspecdefinition(<partition cols...,> <order cols ASC|DESC...,>
    # specifiedwindowframe(...)): partition keys carry no sort
    # direction, ordered keys do, and the frame spec comes last. An
    # unpartitioned spec therefore STARTS either with an ordered column
    # (" ASC"/" DESC" in the first element — rank over the whole table)
    # or with the frame itself (unordered whole-table aggregate,
    # ``Window.partitionBy()`` with no orderBy). Both the spec extraction
    # and the first-element split are paren-BALANCED: a naive [^)]* regex
    # truncates at the first ')' inside an expression-typed key (e.g.
    # ``unix_timestamp(ts#1) ASC``), silently missing its ' ASC' marker —
    # a lint false negative (ADVICE r05 #2).
    for spec in _window_specs(plan):
        first = _split_top_level(spec)[0]
        if (
            " ASC" in first
            or " DESC" in first
            or first.startswith("specifiedwindowframe")
        ):
            findings.append(Finding("global_window", spec[:120]))

    return findings


def _window_specs(plan: str) -> list[str]:
    """All ``windowspecdefinition(...)`` argument strings in ``plan``,
    extracted with paren balancing so nested calls in partition/order
    keys don't truncate the spec."""
    marker = "windowspecdefinition("
    specs: list[str] = []
    pos = 0
    while True:
        start = plan.find(marker, pos)
        if start < 0:
            return specs
        i = start + len(marker) - 1  # index of the opening paren
        depth = 0
        for j in range(i, len(plan)):
            c = plan[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    specs.append(plan[i + 1 : j])
                    pos = j + 1
                    break
        else:  # unbalanced tail (truncated plan line): take what's there
            specs.append(plan[i + 1 :])
            return specs


def _split_top_level(spec: str) -> list[str]:
    """Split ``spec`` on commas at paren depth 0 (stripped)."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for c in spec:
        if c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        cur.append(c)
    parts.append("".join(cur).strip())
    return parts
