"""Physical-plan inspection: the 100 TB plan-audit discipline as an API.

A query that returns correct rows can still carry a plan that
collapses at scale — a filter evaluated after a full scan, a shuffle
where a broadcast belongs, a nested-loop that went cartesian. These
helpers turn the properties worth pinning into inspectable values so
pipelines (and this repo's own ``tests/test_plan_shapes.py``) can
assert them instead of eyeballing ``explain`` output.

The parsing targets Spark's ``explain("formatted")`` text and the
executed-plan string — both stable, documented surfaces (the same
ones a human reads). Nothing here executes the query.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``df.explain("formatted")`` as a string (optimized plan +
    per-node details: PushedFilters, ReadSchema, codegen ids)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan(df: DataFrame) -> str:
    """The executed-plan tree (post-AQE-prep) as a string — the form
    that shows partial/final aggregate modes and exchange reuse."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanSummary:
    """Scale-relevant facts extracted from a physical plan."""

    n_exchanges: int = 0          # hash/range/single-partition shuffles (not broadcasts)
    n_single_exchanges: int = 0   # all-to-one shuffles — a scale red flag
    n_broadcast_joins: int = 0    # BroadcastHashJoin + BroadcastNestedLoopJoin
    n_sort_merge_joins: int = 0
    has_cartesian: bool = False
    has_take_ordered: bool = False  # global top-k without a total sort
    n_codegen_spans: int = 0      # distinct WholeStageCodegen regions
    pushed_filters: list[str] = field(default_factory=list)  # one per scan
    read_schemas: list[str] = field(default_factory=list)    # one per scan

    @property
    def full_scans(self) -> int:
        """Scans whose PushedFilters list is empty — every one reads
        its whole input (fine for an aggregate-everything query,
        a red flag under a selective filter)."""
        return sum(1 for f in self.pushed_filters if not f.strip())


_PUSHED = re.compile(r"PushedFilters: \[([^\]]*)\]")
_SCHEMA = re.compile(r"ReadSchema: (\S+)")
_CODEGEN = re.compile(r"WholeStageCodegen \((\d+)\)")
# A shuffle exchange appears as "Exchange hashpartitioning(...)" in the
# simple/executed-plan style, but formatted mode prints the node header
# bare ("(4) Exchange") with the partitioning on its own detail line
# ("Arguments: hashpartitioning(...)"). Match both — counting only the
# inline form silently returns 0 on formatted text (every exchange cap
# asserted through summarize() was vacuous until this was caught).
_SHUFFLE = re.compile(r"(?:Exchange |Arguments: )(?:hash|range)partitioning\(")
_SINGLE = re.compile(r"(?:Exchange |Arguments: )SinglePartition")


def summarize(df: DataFrame) -> PlanSummary:
    fmt = formatted_plan(df)
    return PlanSummary(
        n_exchanges=len(_SHUFFLE.findall(fmt)) + len(_SINGLE.findall(fmt)),
        n_single_exchanges=len(_SINGLE.findall(fmt)),
        n_broadcast_joins=(
            fmt.count("BroadcastHashJoin") + fmt.count("BroadcastNestedLoopJoin")
        ),
        n_sort_merge_joins=fmt.count("SortMergeJoin"),
        has_cartesian="CartesianProduct" in fmt,
        has_take_ordered="TakeOrderedAndProject" in fmt,
        n_codegen_spans=len(set(_CODEGEN.findall(fmt))),
        pushed_filters=_PUSHED.findall(fmt),
        read_schemas=_SCHEMA.findall(fmt),
    )


def assert_scalable(
    df: DataFrame,
    *,
    max_exchanges: int | None = None,
    forbid_cartesian: bool = True,
    require_pushdown_on: str | None = None,
    require_pruned_out: str | None = None,
) -> PlanSummary:
    """Raise ``AssertionError`` when the plan violates the given
    scale constraints; return the summary for further checks.

    - ``max_exchanges``: cap on data shuffles (broadcasts excluded).
    - ``forbid_cartesian``: no CartesianProduct anywhere (default).
    - ``require_pushdown_on``: this column must appear in some scan's
      PushedFilters (the predicate reached parquet).
    - ``require_pruned_out``: this column must appear in NO scan's
      ReadSchema (column pruning held).
    """
    s = summarize(df)
    if forbid_cartesian and s.has_cartesian:
        raise AssertionError("plan degenerated to a CartesianProduct")
    if max_exchanges is not None and s.n_exchanges > max_exchanges:
        raise AssertionError(
            f"{s.n_exchanges} exchanges in plan (cap {max_exchanges})"
        )
    if require_pushdown_on is not None and not any(
        require_pushdown_on in f for f in s.pushed_filters
    ):
        raise AssertionError(
            f"no scan pushes a filter on {require_pushdown_on!r}: "
            f"{s.pushed_filters}"
        )
    if require_pruned_out is not None and any(
        require_pruned_out in r for r in s.read_schemas
    ):
        raise AssertionError(
            f"{require_pruned_out!r} survives in a ReadSchema — column "
            f"pruning failed: {s.read_schemas}"
        )
    return s


def _node_depth(line: str) -> int:
    """Column where the node name starts in a Spark plan-tree line
    (children render strictly deeper)."""
    for i, ch in enumerate(line):
        if ch not in " :+-*(":
            return i
    return len(line)


def broadcast_subtrees(df: DataFrame) -> list[str]:
    """The text of every BroadcastExchange subtree in the executed
    plan — i.e. exactly what the plan proposes to materialize on
    every executor. Pin scale safety by asserting that nothing
    corpus-sized (a big table's scan, an unbounded aggregate) appears
    in any of them."""
    lines = executed_plan(df).splitlines()
    out: list[str] = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        depth = _node_depth(line)
        sub = [line]
        for nxt in lines[i + 1 :]:
            if nxt.strip() and _node_depth(nxt) <= depth:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out
