"""Logical-plan audit helpers shared by tools/plan_report.py and the
plan-shape regression tests.

The one check that cannot be done on the formatted physical-plan string is
the unbounded-global-window sweep: a Window's partition spec and the
boundedness of its input subtree need the actual plan tree, so these
helpers walk the optimized logical plan via py4j.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iter_plan_nodes(jnode):
    """Depth-first walk over a (logical or physical) Catalyst plan node."""
    stack = [jnode]
    while stack:
        node = stack.pop()
        yield node
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def subtree_is_bounded(jnode) -> bool:
    """True if the subtree's row count is bounded by construction: a limit
    (GlobalLimit/LocalLimit) or an ungrouped aggregate (exactly one row)."""
    for n in iter_plan_nodes(jnode):
        name = n.nodeName()
        if name in ("GlobalLimit", "LocalLimit"):
            return True
        if name == "Aggregate" and n.groupingExpressions().isEmpty():
            return True
    return False


def unbounded_global_windows(df: DataFrame) -> int:
    """Count Window nodes with an empty partition spec over UNBOUNDED input
    — the 'Moving all data to a single partition' scale-killer. A global
    window over a limit/1-row-aggregate result does not count."""
    plan = df._jdf.queryExecution().optimizedPlan()
    hits = 0
    for node in iter_plan_nodes(plan):
        if node.nodeName() != "Window":
            continue
        if node.partitionSpec().isEmpty() and not subtree_is_bounded(node):
            hits += 1
    return hits
