"""Physical-plan audits: scale anti-pattern detectors over Spark's
``executedPlan().toString()`` tree drawing.

The single-partition exchange is Spark's one legitimate serialization
point — the final stage of an ungrouped aggregate, a collect-limit, a
top-k reduction — and a classic 100 TB scale killer everywhere else: a
``Window.orderBy`` without ``partitionBy`` or a global ``Sort`` funnels
the FULL input through one task.  That is exactly the defect the
round-3 review found twice (``pps_sample``'s global cumsum,
``skew_profile``'s global rank; both since rewritten as two-level
shard + broadcast-offset plans).  The detector here keeps the next one
from silently registering: walking down from each ``Exchange
SinglePartition`` node, EVERY path to a leaf must pass a row-bounding
node first (an Aggregate — the partial side emits one row per task per
group set — a Limit, a top-k, or an exchange reuse whose original site
is audited on its own).
"""

from __future__ import annotations

import re

# node names that bound the row count of everything above them
_BOUNDING = re.compile(
    r"Aggregate|Limit|TakeOrderedAndProject|Deduplicate|ReusedExchange"
)
_DRAW = re.compile(r"^[\s:+*-]*")


def _parse_tree(plan: str) -> list[tuple[int, str]]:
    """Reconstruct (depth, node-text) rows from Spark's tree drawing.

    The drawing prefixes children with ``+-`` / ``:-`` / ``:  `` runs;
    the prefix length IS the tree depth, so stripping it and keeping its
    length recovers the parent/child structure without touching py4j
    (which would not see through ``AdaptiveSparkPlan``'s initial plan).
    """
    rows = []
    for line in plan.splitlines():
        stripped = _DRAW.sub("", line)
        if not stripped or stripped.startswith("=="):
            continue
        rows.append((len(line) - len(stripped), stripped))
    return rows


def unbounded_single_partitions(plan: str) -> list[str]:
    """Return the subtree head line of every ``Exchange SinglePartition``
    whose subtree reaches a leaf without passing a bounding node."""
    rows = _parse_tree(plan)
    bad = []
    for i, (depth, text) in enumerate(rows):
        if not text.startswith("Exchange SinglePartition"):
            continue
        # subtree = following rows with strictly greater depth
        j = i + 1
        subtree = []
        while j < len(rows) and rows[j][0] > depth:
            subtree.append(rows[j])
            j += 1
        ok = True
        for k, (d, t) in enumerate(subtree):
            # a leaf is a subtree row with no deeper row directly after it
            is_leaf = k + 1 >= len(subtree) or subtree[k + 1][0] <= d
            if not is_leaf:
                continue
            path = [t]
            cur = d
            for dd, tt in reversed(subtree[:k]):
                if dd < cur:  # nearest shallower row above = ancestor
                    path.append(tt)
                    cur = dd
            if not any(_BOUNDING.search(p) for p in path):
                ok = False
                break
        if not ok:
            bad.append(subtree[0][1] if subtree else "<empty>")
    return bad
