"""Source-level leash on driver-side materialization: the EXACT set of
``collect()``-family call sites in the package must equal the documented
bounded inventory below.

Every site in the allowlist pulls a provably small row set to the driver
(k centroids, distinct partition values, a gated fallback query set, CLI
print loops over final results).  A new ``.collect()`` / ``toPandas()`` /
``toLocalIterator`` anywhere else fails this test until its bound is
reviewed and the site added here — the same leash discipline as
``test_registry_plan_audit.BNLJ_ALLOWED``.

Keyed on (module-relative path, enclosing function) -> (call-site
COUNT, rationale) rather than line numbers, so unrelated edits don't
churn the pin but a second, unreviewed collect inside an
already-allowlisted function still trips the leash (the round-4
review's gap in the set-keyed version).
"""

from __future__ import annotations

import ast
import os
from collections import Counter

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "gotrackmaster_spark")

_METHODS = {"collect", "collectAsMap", "toPandas", "toLocalIterator"}

# (path relative to the package, enclosing function) ->
#     (reviewed call-site count, why it is bounded)
ALLOWED = {
    # CLI print loops over FINAL query results (driver output by design;
    # each prints a per-track/per-pair report the user asked for)
    ("__main__.py", "main"): (5, "CLI result printing"),
    # partition-value discovery for replace_partitions routing:
    # O(distinct partition values) rows, never data rows
    ("plans/checkpoint.py", "merge"): (1, "distinct partition values"),
    # k-row centroid pulls (k = nlist / k, both caller-bounded knobs);
    # the broadcast-back is the IVF / Lloyd design
    ("operators/dedup.py", "ivf_centroids"): (1, "k centroid rows"),
    ("operators/clustering.py", "kmeans_quantized"): (2, "k centroid rows"),
    # gated kNN brute-force fallback: only queries whose ring found no
    # candidate (logged; bounded by the spherical guarantee pre-filter)
    ("operators/spatial.py", "_rank_with_exact_fallback"): (1, "fallback query ids"),
    # single MAX(level) scalar driving the compaction loop depth
    ("functions/cells.py", "compact_cells"): (1, "1-row max level"),
}


def _sites() -> Counter:
    found = Counter()
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, PKG)
            tree = ast.parse(open(path).read())
            hits = [
                node.lineno
                for node in ast.walk(tree)
                if isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in _METHODS
            ]
            if not hits:
                continue
            spans = []
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    spans.append((node.lineno, node.end_lineno, node.name))
            for h in hits:
                encl = "<module>"
                best_start = -1
                for s, e, name in spans:
                    if s <= h <= e and s > best_start:
                        encl, best_start = name, s
                found[(rel, encl)] += 1
    return found


def test_collect_sites_match_bounded_inventory():
    found = _sites()
    expected = {k: n for k, (n, _why) in ALLOWED.items()}
    diffs = {
        k: (expected.get(k, 0), found.get(k, 0))
        for k in set(expected) | set(found)
        if expected.get(k, 0) != found.get(k, 0)
    }
    assert not diffs, (
        "collect-site inventory drift — (site): (reviewed, found); a count above "
        "the reviewed one is a NEW unreviewed driver-side materialization: "
        f"{sorted(diffs.items())}"
    )
