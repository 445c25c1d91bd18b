"""Full-inventory plan-lint sweep as a pytest guard (VERDICT r7 ask #2):
a query added in any round can never ship with the scale backstop red —
this test plans EVERY exported query (plan strings only, nothing
executes) and fails on any unwhitelisted cartesian / row-UDF /
unpartitioned-window shape. The heuristics themselves are unit-tested
in tests/test_operators.py::test_plan_lint_heuristics; the structural
one-row-NLJ detector is unit-tested below.
"""

from __future__ import annotations
import pytest

import importlib.util as ilu
import os


def _load_plan_lint():
    spec = ilu.spec_from_file_location(
        "plan_lint",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "plan_lint.py"),
    )
    pl = ilu.module_from_spec(spec)
    spec.loader.exec_module(pl)
    return pl


@pytest.mark.slow  # r12: excluded from the driver verify budget (see conftest)
def test_full_inventory_plan_lint(spark, sf_dir):
    pl = _load_plan_lint()
    violations, whitelisted, structural = pl.sweep(spark, sf_dir, echo=lambda *_: None)
    assert violations == [], "plan-lint backstop red:\n" + "\n".join(violations)
    # every whitelist entry must still FIRE — a stale entry would
    # silently mask a future plan regression on that query
    fired = {w.split(" ")[0] for w in whitelisted}
    stale = {n for n, checks in pl.WHITELIST.items() if n not in fired}
    assert stale == set(), f"stale whitelist entries (no longer fire): {stale}"
    # the scalar-attach idiom must be recognized structurally, not by name
    assert "collocation_pmi_top" in structural


def test_one_row_nlj_structural_detector():
    pl = _load_plan_lint()

    # crossJoin against a grouping-key-free aggregate -> one-row side,
    # recognized structurally
    scalar_attach = (
        "== Physical Plan ==\n"
        "BroadcastNestedLoopJoin (5)\n"
        ":- Scan parquet (1)\n"
        "+- BroadcastExchange (4)\n"
        "   +- HashAggregate (3)\n"
        "      +- Scan parquet (2)\n"
        "\n\n"
        "(3) HashAggregate\nInput [1]: [c#1L]\nKeys: []\n"
        "Functions [1]: [sum(c#1L)]\n\n"
        "(5) BroadcastNestedLoopJoin\nJoin type: Cross\n"
    )
    assert pl._nlj_one_row_side(scalar_attach)
    assert pl.lint_one("x", scalar_attach) == [
        ("one_row_nlj_ok", "all NLJ sides provably <= 1 row (scalar attach)")
    ]

    # chained: the broadcast side is ITSELF a cross of two 1-row aggs
    chained = (
        "== Physical Plan ==\n"
        "BroadcastNestedLoopJoin (9)\n"
        ":- Scan parquet (1)\n"
        "+- BroadcastExchange (8)\n"
        "   +- BroadcastNestedLoopJoin (7)\n"
        "      :- HashAggregate (3)\n"
        "      :  +- Scan parquet (2)\n"
        "      +- BroadcastExchange (6)\n"
        "         +- HashAggregate (5)\n"
        "            +- Scan parquet (4)\n"
        "\n\n"
        "(3) HashAggregate\nKeys: []\n\n"
        "(5) HashAggregate\nKeys: []\n"
    )
    assert pl._nlj_one_row_side(chained)

    # a GROUPED aggregate on the broadcast side is unbounded -> violation
    grouped = (
        "== Physical Plan ==\n"
        "BroadcastNestedLoopJoin (5)\n"
        ":- Scan parquet (1)\n"
        "+- BroadcastExchange (4)\n"
        "   +- HashAggregate (3)\n"
        "      +- Scan parquet (2)\n"
        "\n\n"
        "(3) HashAggregate\nInput [2]: [k#1, c#2L]\nKeys [1]: [k#1]\n\n"
        "(5) BroadcastNestedLoopJoin\nJoin type: Cross\n"
    )
    assert not pl._nlj_one_row_side(grouped)
    assert any(c == "nested_loop" for c, _ in pl.lint_one("x", grouped))

    # two raw scans -> a genuine cartesian, never excused
    raw = (
        "== Physical Plan ==\n"
        "CartesianProduct (3)\n"
        ":- Scan parquet (1)\n"
        "+- Scan parquet (2)\n"
        "\n\n"
        "(3) CartesianProduct\nJoin condition: None\n"
    )
    assert not pl._nlj_one_row_side(raw)
    assert any(c == "cartesian" for c, _ in pl.lint_one("x", raw))

    # one benign NLJ does NOT excuse a second unbounded one in the same plan
    mixed = (
        "== Physical Plan ==\n"
        "BroadcastNestedLoopJoin (8)\n"
        ":- BroadcastNestedLoopJoin (5)\n"
        ":  :- Scan parquet (1)\n"
        ":  +- BroadcastExchange (4)\n"
        ":     +- HashAggregate (3)\n"
        ":        +- Scan parquet (2)\n"
        "+- BroadcastExchange (7)\n"
        "   +- Scan parquet (6)\n"
        "\n\n"
        "(3) HashAggregate\nKeys: []\n"
    )
    assert not pl._nlj_one_row_side(mixed)
