"""Physical-plan linter: the repo's "would this survive a 100× scale-up?"
review checklist, codified.

tests/test_plan_shapes.py pins these properties query-by-query; this
module is the same judgment as a REUSABLE advisory pass a developer (or
CI) can run on any DataFrame before shipping it — the checks mirror the
scale rules the engine is built around:

- ``cartesian``        CartesianProduct — all-pairs row explosion.
- ``nested-loop``      BroadcastNestedLoopJoin — fine over broadcast
                       scalars/tiny tables (several catalog queries use
                       it deliberately), lethal when either side is a
                       fact table: surfaced as a warning to be judged.
- ``global-window``    a Window with an EMPTY partition spec — a
                       single-partition sort unless its input is a
                       bounded aggregate (the q135/q229 discussion);
                       surfaced as a warning for exactly that judgment.
- ``global-sort``      a top-level Sort that is not part of a window or
                       TakeOrdered — usually an ``orderBy`` on a big
                       result (fine for top-k via TakeOrdered, which
                       this check does NOT flag).
- ``python-eval``      BatchEvalPython / row-at-a-time Python UDFs in
                       the plan — the slow path; ArrowEvalPython (pandas
                       UDFs) passes.
- ``unpushed-filter``  a parquet scan with data filters present but
                       NOTHING pushed (``PushedFilters: []``) — a
                       predicate shape (function-over-column, UDF) is
                       defeating row-group pruning (the q237 year()
                       lesson).

Advisory by design: findings are heuristics over the formatted plan
text, not proofs — a global window over a 12-row aggregate is FINE and
only the author knows the cardinality. The linter's job is to make the
author look."""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanFinding:
    code: str
    severity: str  # "error" | "warning"
    message: str


def _formatted(df: DataFrame) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def lint_plan(df: DataFrame) -> list[PlanFinding]:
    """Lint a DataFrame's physical plan; returns findings, worst first.
    Empty list = nothing suspicious under the checks above."""
    plan = _formatted(df)
    findings: list[PlanFinding] = []

    if re.search(r"^\(\d+\) CartesianProduct", plan, re.M):
        findings.append(
            PlanFinding(
                "cartesian",
                "error",
                "CartesianProduct in plan: all-pairs row explosion — add a "
                "join condition or broadcast a bounded side",
            )
        )
    n_bnlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M))
    if n_bnlj:
        findings.append(
            PlanFinding(
                "nested-loop",
                "warning",
                f"{n_bnlj} BroadcastNestedLoopJoin node(s): fine over "
                "broadcast scalars/register-sized tables, lethal when a "
                "side is fact-sized — check the build side's cardinality",
            )
        )
    # windowspecdefinition(partitionCols..., orderCols..., frame): an
    # empty partition spec starts directly with the order expression's
    # sort direction further in; detect via the Window node's
    # "Arguments:" line carrying "windowspecdefinition(" with no
    # partition list before the first ASC/DESC spec.
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = m.group(1)
        first = args.split(",")[0].strip()
        if re.match(r"^\S+ (ASC|DESC)", first) or first.startswith(
            "specifiedwindowframe"
        ):
            findings.append(
                PlanFinding(
                    "global-window",
                    "warning",
                    "Window with empty PARTITION BY: a single-partition "
                    "sort unless its input is a bounded aggregate — "
                    "verify the input cardinality or use the "
                    "percentile_approx/prefix-sum recipes",
                )
            )
            break
    # global Sort node that is NOT under TakeOrderedAndProject and not a
    # window's sort: formatted plans emit "(n) Sort" with
    # "Arguments: [cols], true, 0" where the boolean is global=true
    for m in re.finditer(
        r"^\(\d+\) Sort\b[\s\S]*?Arguments: \[[^\]]*\], true,", plan, re.M
    ):
        findings.append(
            PlanFinding(
                "global-sort",
                "warning",
                "global Sort (orderBy) in plan: fine on a bounded result, "
                "a full-shuffle range sort on a fact table — prefer "
                "TakeOrdered (limit) or drop the ordering",
            )
        )
        break
    if "BatchEvalPython" in plan:
        findings.append(
            PlanFinding(
                "python-eval",
                "error",
                "row-at-a-time Python UDF (BatchEvalPython) in plan: "
                "10-100x slower than builtins/pandas UDFs — rewrite with "
                "pyspark.sql.functions or an Arrow-batched UDF",
            )
        )
    # scans whose DataFilters exist but nothing reached PushedFilters
    # a Filter NODE sitting directly on a scan whose PushedFilters carry
    # nothing beyond inferred IsNotNull checks: the predicate shape
    # (function-over-column, UDF) defeated pushdown — it never appears
    # in DataFilters at all, it stays a separate Filter above the scan
    # tree section only: details headers start at column 0 as "(n) Node"
    # and would create false Filter/Scan adjacencies
    tree_lines = [
        ln
        for ln in plan.splitlines()
        if re.search(r"\(\d+\)", ln) and not re.match(r"^\(\d+\) ", ln)
    ]

    def _real_predicate(filter_line: str) -> bool:
        # look up the Filter node's Condition in the details section;
        # a condition that is ONLY isnotnull conjuncts (join-inferred
        # null checks above a dim scan) is not a pushdown failure
        m_id = re.search(r"\((\d+)\)", filter_line)
        if not m_id:
            return False
        m_cond = re.search(
            rf"^\({m_id.group(1)}\) Filter[\s\S]*?Condition : (.*)$",
            plan,
            re.M,
        )
        if not m_cond:
            return False
        cond = m_cond.group(1)
        stripped = re.sub(r"isnotnull\([^)]*\)", "", cond)
        return bool(re.search(r"[<>=]|LIKE|IN \(", stripped))

    filter_on_scan = any(
        "Filter" in a
        and ("ColumnarToRow" in b or "Scan" in b)
        and _real_predicate(a)
        for a, b in zip(tree_lines, tree_lines[1:])
    )
    if filter_on_scan:
        pushes = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        only_nullchecks = pushes and all(
            not [
                f
                for f in p.split(",")
                if f.strip() and not f.strip().startswith("IsNotNull")
            ]
            for p in pushes
        )
        if only_nullchecks:
            findings.append(
                PlanFinding(
                    "unpushed-filter",
                    "warning",
                    "a Filter sits on the scan but PushedFilters carries "
                    "only inferred IsNotNull checks: the predicate shape "
                    "defeats row-group pruning (wrap-free column "
                    "comparisons push; function-over-column does not — "
                    "the year()-vs-range lesson)",
                )
            )
    order = {"error": 0, "warning": 1}
    findings.sort(key=lambda f: order[f.severity])
    return findings
