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
group set — a Limit, a top-k, or an exchange reuse that resolves to a
bounded original subtree).

Known false-negative classes (documented per the round-4 review —
deliberate, because the registry's reviewed convention accepts them):

- **Grouped aggregates count as bounding** even though a group-by over
  an unbounded key (``user_id``) bounds nothing.  The cardinality of a
  grouping key is statically unknowable from the plan string, and the
  repo's reviewed convention (pinned by
  ``test_single_partition_detector_fires_and_clears``) is that a global
  sort of *aggregated* rows is an accepted final-display shape; the
  per-query review, not this detector, owns the judgment that the key
  set is small.
- **Deduplicate counts as bounding** for the same reason: ``distinct``
  over an unbounded key bounds nothing, but every registry use is a
  reviewed small-domain dedup.

``ReusedExchange`` is NOT assumed bounding (it reuses an arbitrary
exchange, possibly an unbounded hash shuffle): it is resolved to the
original exchange by ``plan_id`` and that exchange's own subtree is
audited with the same rules; a reuse of a SinglePartition exchange is
accepted here because its original site is flagged on its own if
unbounded.  An unresolvable reuse is treated as unbounded (flag —
conservative).
"""

from __future__ import annotations

import re

# node names that bound the row count of everything above them (see the
# module docstring for the documented grouped-Aggregate / Deduplicate
# false-negative classes)
_BOUNDING = re.compile(r"Aggregate|Limit|TakeOrderedAndProject|Deduplicate")
_DRAW = re.compile(r"^[\s:+*-]*")
_PLAN_ID = re.compile(r"\[plan_id=(\d+)\]")


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


def _subtree(rows: list[tuple[int, str]], i: int) -> list[tuple[int, str]]:
    """Rows strictly below ``rows[i]`` in the tree (its subtree)."""
    depth = rows[i][0]
    j = i + 1
    sub = []
    while j < len(rows) and rows[j][0] > depth:
        sub.append(rows[j])
        j += 1
    return sub


def _leaf_paths(subtree: list[tuple[int, str]]):
    """Yield the ancestor path (leaf-first, within the subtree) of every
    leaf of ``subtree``."""
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
        yield path


def _reuse_bounded(text: str, rows: list[tuple[int, str]], budget: int) -> bool:
    """Resolve a ``ReusedExchange`` node to its original exchange and
    decide whether the reused output is row-bounded.

    A reuse of a SinglePartition exchange is accepted: the original site
    is audited (and flagged) on its own, so repeating the finding here
    would only duplicate it.  Any other reuse is bounded iff the
    original exchange's own subtree is bounded under the same rules.
    ``budget`` caps resolution depth (reuse chains are short; a cycle is
    impossible in a physical plan but the guard keeps this total).
    """
    if budget <= 0:
        return False
    if "SinglePartition" in text:
        return True
    m = _PLAN_ID.search(text)
    if not m:
        return False  # unresolvable — conservative: treat as unbounded
    ref = f"[plan_id={m.group(1)}]"
    for i, (_, t) in enumerate(rows):
        if t.startswith(("Exchange", "BroadcastExchange")) and ref in t:
            sub = _subtree(rows, i)
            if not sub:
                return False
            return all(
                _path_bounded(path, rows, budget - 1) for path in _leaf_paths(sub)
            )
    return False


def _path_bounded(path: list[str], rows: list[tuple[int, str]], budget: int) -> bool:
    """True iff some node on the leaf→ancestor ``path`` bounds rows."""
    for p in path:
        if _BOUNDING.search(p):
            return True
        if p.startswith("ReusedExchange") and _reuse_bounded(p, rows, budget):
            return True
    return False


def unbounded_single_partitions(plan: str) -> list[str]:
    """Return the subtree head line of every ``Exchange SinglePartition``
    whose subtree reaches a leaf without passing a bounding node."""
    rows = _parse_tree(plan)
    bad = []
    for i, (depth, text) in enumerate(rows):
        if not text.startswith("Exchange SinglePartition"):
            continue
        subtree = _subtree(rows, i)
        ok = all(_path_bounded(path, rows, budget=4) for path in _leaf_paths(subtree))
        if not ok:
            bad.append(subtree[0][1] if subtree else "<empty>")
    return bad
