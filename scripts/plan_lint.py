"""Plan lint: sweep EVERY exported query's physical plan for
scale-killer operators and report violations. PLANS.md audits the
headline set by hand; this is the automated backstop over the full
inventory — a query added or changed in any round can't silently ship
a cartesian product, a row-at-a-time Python eval, or an unpartitioned
window over raw input.

Checks per query (plan-string, no execution):
- CartesianProduct / BroadcastNestedLoopJoin — O(n·m) join shapes.
  The "attach a 1-row broadcast scalar" idiom (global-aggregate
  crossJoin) is recognized STRUCTURALLY — a side that bottoms out in a
  grouping-key-free aggregate emits exactly one row, so the join is
  O(n); anything else needs a whitelist entry with a justification.
- BatchEvalPython — row-at-a-time (non-Arrow) Python UDF in the plan.
  ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas are the fast
  paths and are NOT flagged.
- Window with an empty partition spec whose input is NOT a bounded
  aggregate (heuristic: a `Window` node with `windowspecdefinition(...)`
  lacking a partition column AND no HashAggregate below it in the same
  subtree). Bounded post-aggregate global windows are whitelisted.

Usage:
    python scripts/plan_lint.py [sf_dir]      # default /root/testdata/sf0.01
Exit 1 on any unwhitelisted violation. tests/test_plan_lint.py runs the
same sweep over the FULL inventory (plan strings only, no execution) so
a new query can't ship with this backstop red; the heuristics
themselves are unit-tested in tests/test_operators.py.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libmr_spark.plans.explain import formatted_plan
from libmr_spark.queries import QUERIES
from libmr_spark.session import get_spark

# name -> {check: reason} justified exceptions; every entry must say WHY
# the shape is bounded at scale. Keep this list MINIMAL: an entry that
# no longer fires should be deleted (it would silently mask a future
# plan regression) — the lint run prints every whitelist hit, so a
# stale entry is visible as a missing "ok" line.
#
# NOTE the common "attach a 1-row broadcast scalar" idiom (global
# aggregate crossJoin'd onto a big table — TPC-H q11/q22 thresholds,
# BM25 corpus scalars, PMI normalizers) is NOT whitelisted by name:
# _nlj_one_row_side() proves it structurally from the plan (the
# broadcast side bottoms out in a grouping-key-free aggregate, which
# emits exactly one row by construction), so new queries using the
# idiom pass without bookkeeping and a REAL unbounded NLJ still fails.
WHITELIST: dict[str, dict[str, str]] = {
    "distinct_users_rolling_hll": {
        "nested_loop": "trailing-window theta join over the per-day sketch PARTIAL table — both sides are O(|days|) rows of kilobyte sketches by construction, raw events are touched once upstream",
    },
    "ab_welch_t_by_type": {
        "nested_loop": "inequality self-join of the POST-AGGREGATE per-type moment table — both sides are |event_types| rows of four scalars by construction, never raw events",
    },
    "quality_percentile_filter": {
        "global_window": "oracle-exact global percent_rank; the documented 100 TB swap is approx_percentile(quality, 0.9) broadcast as a scalar threshold (see query description)",
    },
}


_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")

# nodes that never increase row count — safe to look through when
# deciding whether a subtree emits at most one row
_PASSTHROUGH = (
    "Project",
    "Filter",
    "ColumnarToRow",
    "InputAdapter",
    "WholeStageCodegen",
    "BroadcastExchange",
    "Exchange",
    "Sort",
    "Coalesce",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "ReusedExchange",
    "Subquery",
)


def _parse_tree(plan: str) -> list[tuple[int, str, int]]:
    """The indented tree section as (depth, name, num) rows."""
    entries: list[tuple[int, str, int]] = []
    for line in plan.split("\n\n", 1)[0].splitlines():
        m = re.match(r"^([\s:+\-]*)(?:\* )?([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$", line)
        if m:
            entries.append((len(m.group(1)), m.group(2), int(m.group(3))))
    return entries


def _node_details(plan: str) -> dict[int, str]:
    """Map node number -> its detail block from the ===details=== section."""
    out: dict[int, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) ([^\n]+)\n((?:(?!\(\d+\) )[^\n]*\n?)*)", plan, re.MULTILINE
    ):
        out[int(m.group(1))] = m.group(2) + "\n" + m.group(3)
    return out


def _direct_children(entries, i):
    """Indices of entry i's direct children in the parsed tree."""
    depth = entries[i][0]
    kids, min_d = [], None
    for j in range(i + 1, len(entries)):
        d = entries[j][0]
        if d <= depth:
            break
        if min_d is None or d < min_d:
            min_d = d
            kids = [j]
        elif d == min_d:
            kids.append(j)
    return kids


def _one_row_subtree(entries, details, i) -> bool:
    """True if the subtree rooted at entry i provably emits <= 1 row.

    Bottoms out at an aggregate with no grouping keys (``Keys: []`` —
    a grouping-key-free final aggregate emits exactly one row), looks
    through row-preserving nodes, and treats a cross join of one-row
    sides as one row. Anything else (scans, joins on keys, generators)
    is unbounded → False.
    """
    depth, name, num = entries[i]
    if any(a in name for a in _AGG_NODES):
        det = details.get(num, "")
        if re.search(r"^Keys: \[\]", det, re.MULTILINE) or "Keys: []" in det:
            return True
        # non-empty grouping keys: unbounded
        kids = _direct_children(entries, i)
        return all(_one_row_subtree(entries, details, k) for k in kids) if kids else False
    if name.startswith(("BroadcastNestedLoopJoin", "CartesianProduct")):
        kids = _direct_children(entries, i)
        return bool(kids) and all(_one_row_subtree(entries, details, k) for k in kids)
    if name.startswith(_PASSTHROUGH) or "Limit" in name:
        kids = _direct_children(entries, i)
        return bool(kids) and all(_one_row_subtree(entries, details, k) for k in kids)
    return False


def _nlj_one_row_side(plan: str) -> bool:
    """True iff EVERY BroadcastNestedLoopJoin / CartesianProduct in the
    plan has at least one side that provably emits <= 1 row (the
    "attach a broadcast scalar" idiom — O(n), not O(n*m))."""
    entries = _parse_tree(plan)
    details = _node_details(plan)
    found = False
    for i, (_d, name, _n) in enumerate(entries):
        if not name.startswith(("BroadcastNestedLoopJoin", "CartesianProduct")):
            continue
        found = True
        kids = _direct_children(entries, i)
        if not kids or not any(_one_row_subtree(entries, details, k) for k in kids):
            return False
    return found


def _subtree_has_agg(plan: str) -> dict[int, bool]:
    """Map node number -> whether any aggregate node is in its SUBTREE.

    Parses the indented tree section of a formatted plan ("NodeName (n)"
    lines; depth = length of the "+- "/":- " prefix). A node's subtree
    is the run of following lines with strictly greater depth.
    """
    entries = _parse_tree(plan)
    out: dict[int, bool] = {}
    for i, (depth, _name, num) in enumerate(entries):
        has = False
        for d2, name2, _n2 in entries[i + 1 :]:
            if d2 <= depth:
                break
            if any(a in name2 for a in _AGG_NODES):
                has = True
                break
        out[num] = has
    return out


def lint_one(name: str, plan: str) -> list[tuple[str, str]]:
    """Return (check, evidence) violations for one plan string."""
    out: list[tuple[str, str]] = []
    has_cart = re.search(r"^\(\d+\) CartesianProduct", plan, re.MULTILINE)
    has_nlj = re.search(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.MULTILINE)
    if (has_cart or has_nlj) and _nlj_one_row_side(plan):
        # structural pass: every NLJ/cartesian side bottoms out in a
        # grouping-key-free aggregate → 1-row broadcast scalar attach
        out.append(("one_row_nlj_ok", "all NLJ sides provably <= 1 row (scalar attach)"))
    else:
        if has_cart:
            out.append(("cartesian", "CartesianProduct node in physical plan"))
        if has_nlj:
            out.append(("nested_loop", "BroadcastNestedLoopJoin node in physical plan"))
    if re.search(r"^\(\d+\) BatchEvalPython", plan, re.MULTILINE):
        out.append(("py_udf", "row-at-a-time BatchEvalPython (use pandas_udf)"))
    # unpartitioned window over non-aggregate input: find Window nodes
    # with an empty partition list; flag unless an Aggregate feeds THIS
    # window (scoped to the node's subtree via the plan tree — a global
    # window over raw input is not excused by an unrelated aggregate
    # elsewhere in the plan).
    agg_below = _subtree_has_agg(plan)
    for m in re.finditer(r"^\((\d+)\) Window\b.*$", plan, re.MULTILINE):
        seg = plan[m.start() : m.start() + 2000]
        spec = re.search(r"windowspecdefinition\(([^)]*)\)", seg)
        if spec is None:
            continue
        args = spec.group(1)
        # partition cols precede the ordering's "ASC NULLS FIRST/..." args;
        # empty partition spec => spec starts with an ordered col or frame
        has_partition = not (args.split(",")[0].strip().endswith(("ASC NULLS FIRST", "DESC NULLS LAST", "ASC NULLS LAST", "DESC NULLS FIRST")) or "specifiedwindowframe" in args.split(",")[0])
        if has_partition:
            continue
        node_num = int(m.group(1))
        # fall back to the whole-plan check only if tree parsing missed
        # this node (unexpected explain format)
        if node_num in agg_below:
            if agg_below[node_num]:
                continue  # bounded post-aggregate global window
        elif any(a in plan for a in _AGG_NODES):
            continue
        out.append(("global_window", "unpartitioned Window without an aggregate below it"))
    return out


def sweep(spark, sf_dir: str, echo=print):
    """Lint every exported query's plan. Returns (violations,
    whitelisted, structural) where violations is a list of
    "name [check]: evidence" strings — empty means the backstop is
    green. Plan strings only; nothing executes."""
    violations: list[str] = []
    whitelisted: list[str] = []
    structural: list[str] = []
    for name, q in QUERIES.items():
        try:
            plan = formatted_plan(q.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — a planning error is itself a finding
            violations.append(f"{name} [plan-error]: {type(e).__name__}: {str(e)[:120]}")
            echo(f"ERROR {name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        for check, evidence in lint_one(name, plan):
            if check == "one_row_nlj_ok":
                structural.append(name)
                echo(f"ok    {name} [structural]: {evidence}")
                continue
            reason = WHITELIST.get(name, {}).get(check)
            if reason:
                whitelisted.append(f"{name} [{check}]")
                echo(f"ok    {name} [{check}] whitelisted: {reason[:90]}")
            else:
                violations.append(f"{name} [{check}]: {evidence}")
                echo(f"VIOL  {name} [{check}]: {evidence}")
    return violations, whitelisted, structural


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-lint")
    violations, whitelisted, structural = sweep(spark, sf_dir)
    print(
        f"\n{len(QUERIES)} queries linted, {len(violations)} violations, "
        f"{len(whitelisted)} whitelisted, {len(structural)} structural 1-row-NLJ passes"
    )
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
