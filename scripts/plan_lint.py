"""Plan lint: sweep EVERY exported query's physical plan for
scale-killer operators and report violations. PLANS.md audits the
headline set by hand; this is the automated backstop over the full
inventory — a query added or changed in any round can't silently ship
a cartesian product, a row-at-a-time Python eval, or an unpartitioned
window over raw input.

Checks per query (plan-string, no execution):
- CartesianProduct / BroadcastNestedLoopJoin — O(n·m) join shapes.
  (A broadcast NLJ over a bounded literal/dim side is sometimes fine;
  whitelist below carries the justification.)
- BatchEvalPython — row-at-a-time (non-Arrow) Python UDF in the plan.
  ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas are the fast
  paths and are NOT flagged.
- Window with an empty partition spec whose input is NOT a bounded
  aggregate (heuristic: a `Window` node with `windowspecdefinition(...)`
  lacking a partition column AND no HashAggregate below it in the same
  subtree). Bounded post-aggregate global windows are whitelisted.

Usage:
    python scripts/plan_lint.py [sf_dir]      # default /root/testdata/sf0.01
Exit 1 on any unwhitelisted violation (pytest wraps this in
tests/test_plan_lint.py).
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
WHITELIST: dict[str, dict[str, str]] = {
    "scalar_subquery_above_avg_orders": {
        "nested_loop": "scalar subquery (global AVG) compiles to a 1-row broadcast NLJ — broadcast side is a single row by construction",
    },
    "q11_important_parts": {
        "nested_loop": "TPC-H q11's value-fraction threshold is a scalar subquery → 1-row broadcast NLJ",
    },
    "q22_idle_customer_balance": {
        "nested_loop": "TPC-H q22's avg-balance threshold is a scalar subquery → 1-row broadcast NLJ",
    },
    "key_skew_profile": {
        "nested_loop": "crossJoin against the broadcast 1-row (total, n_keys) aggregate — single-row side by construction",
    },
    "domain_mixture_resample": {
        "nested_loop": "crossJoin against the broadcast 1-row feasible-total (min over 20 sources) aggregate — single-row side by construction",
    },
    "fluency_bigram_deciles": {
        "nested_loop": "crossJoin against the broadcast 1-row vocabulary-size aggregate — single-row side by construction",
    },
    "triangle_count_copurchase": {
        "nested_loop": "crossJoin of the three 1-row count aggregates (vertices x edges x triangles) — every side is a single row by construction",
    },
    "distinct_users_rolling_hll": {
        "nested_loop": "trailing-window theta join over the per-day sketch PARTIAL table — both sides are O(|days|) rows of kilobyte sketches by construction, raw events are touched once upstream",
    },
    "ab_welch_t_by_type": {
        "nested_loop": "inequality self-join of the POST-AGGREGATE per-type moment table — both sides are |event_types| rows of four scalars by construction, never raw events",
    },
    "time_decayed_user_score": {
        "nested_loop": "crossJoin against the broadcast 1-row global max-ts anchor aggregate — single-row side by construction",
    },
    "leakage_safe_split": {
        "nested_loop": "crossJoin against the broadcast 1-row leakage-audit count (groups spanning >1 split, structurally 0) — single-row side by construction",
    },
    "mixture_temperature_weights": {
        "nested_loop": "crossJoin against the broadcast 1-row normalizer (DECIMAL sum over |sources| quantized weights) — single-row side by construction",
    },
    "quality_percentile_filter": {
        "global_window": "oracle-exact global percent_rank; the documented 100 TB swap is approx_percentile(quality, 0.9) broadcast as a scalar threshold (see query description)",
    },
    "bm25_topk": {
        "nested_loop": "crossJoin against the broadcast 1-row corpus-scalar aggregate (N docs, total tokens) — single-row side by construction (bm25_rank in operators/retrieval.py)",
    },
    "bm25_index_incremental": {
        "nested_loop": "same bm25_rank 1-row corpus-scalar broadcast, fed from the persisted doclen table instead of the corpus",
    },
    "streaming_bm25_index": {
        "nested_loop": "same bm25_rank 1-row corpus-scalar broadcast (store-served after the stream drains)",
    },
    "bm25_cosine_rerank": {
        "nested_loop": "the lexical stage is bm25_rank — same 1-row corpus-scalar broadcast; the rerank stage joins by key only",
    },
}


_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def _subtree_has_agg(plan: str) -> dict[int, bool]:
    """Map node number -> whether any aggregate node is in its SUBTREE.

    Parses the indented tree section of a formatted plan ("NodeName (n)"
    lines; depth = length of the "+- "/":- " prefix). A node's subtree
    is the run of following lines with strictly greater depth.
    """
    entries: list[tuple[int, str, int]] = []  # (depth, name, num)
    for line in plan.split("\n\n", 1)[0].splitlines():
        m = re.match(r"^([\s:+\-]*)(?:\* )?([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$", line)
        if m:
            entries.append((len(m.group(1)), m.group(2), int(m.group(3))))
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
    if re.search(r"^\(\d+\) CartesianProduct", plan, re.MULTILINE):
        out.append(("cartesian", "CartesianProduct node in physical plan"))
    if re.search(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.MULTILINE):
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-lint")
    n_viol = 0
    n_wl = 0
    for name, q in QUERIES.items():
        try:
            plan = formatted_plan(q.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — a planning error is itself a finding
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:120]}")
            n_viol += 1
            continue
        for check, evidence in lint_one(name, plan):
            reason = WHITELIST.get(name, {}).get(check)
            if reason:
                n_wl += 1
                print(f"ok    {name} [{check}] whitelisted: {reason[:90]}")
            else:
                n_viol += 1
                print(f"VIOL  {name} [{check}]: {evidence}")
    print(f"\n{len(QUERIES)} queries linted, {n_viol} violations, {n_wl} whitelisted")
    return 1 if n_viol else 0


if __name__ == "__main__":
    raise SystemExit(main())
