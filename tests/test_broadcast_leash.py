"""Source-level leash on FORCED broadcasts: the exact set of
``F.broadcast(...)`` call sites in the package must equal the reviewed
inventory below.

A forced broadcast overrides Catalyst's size-based decision, so every
site is a standing claim that the broadcast side is bounded — the claim
the round-3 review found violated four times (O(users) cohorts /
centroids / verdicts, O(vocab) df), all demoted in round 4.  This leash
makes the next unbounded hint a test failure instead of a review find:
adding a ``broadcast()`` anywhere new (or moving one) fails until the
site is reviewed and added here with its bound.

Keyed on (package-relative path, enclosing function); per-class bound
rationale lives in the PLANS.md round-4 sweep table ("forced broadcast
of table-sized side" row) and in each site's docstring.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "gotrackmaster_spark")

# Bound classes (see PLANS.md):
#   scalar   – 1-row ungrouped aggregate (the allowlisted BNLJ shape)
#   k-row    – caller-bounded k (top-k ids, centroids, offsets, steps)
#   dict     – query/eval-side dictionary (≤ |query terms| / eval set)
#   covering – polygon/cell covering, cap-demoted at _COVERING_BROADCAST_CAP
#   dim      – TPC-H dimension table (region/nation/date ladder)
#   grid     – fixed-size raster/grid (DEM tiles, quadrat lattice)
ALLOWED = {
    # --- driver-query modules -------------------------------------
    ("dq_graph.py", "q_graph_summary"),          # scalar ×2
    ("dq_relational.py", "q_assoc_rules"),       # scalar + k-row rule heads
    ("dq_relational.py", "q_bloom_semijoin"),    # bloom bit set (fixed size)
    ("dq_relational.py", "q_funnel_steps"),      # scalar step counts ×3
    ("dq_relational.py", "q_kendall_tau"),       # scalar
    ("dq_relational.py", "q_ks_statistic"),      # scalar
    ("dq_relational.py", "q_pps_sample"),        # scalar total + shard offsets
    ("dq_relational.py", "q_regional_revenue"),  # dim ×4
    ("dq_relational.py", "q_shipping_priority"), # dim
    ("dq_relational.py", "q_small_qty_revenue"), # dim
    ("dq_relational.py", "q_tz_localized"),      # dim (tz polygons)
    ("dq_relational.py", "q_value_mad"),         # scalar median attach
    ("dq_relational.py", "q_zipf_check"),        # scalar
    ("dq_spatial.py", "q_trajectory_jaccard"),   # k-row capped cell lists
    ("dq_text.py", "q_term_pmi"),                # scalar corpus size
    ("dq_text.py", "q_tile_top_terms"),          # dict (per-tile top terms)
    ("dq_text.py", "q_vocab_growth"),            # k-row shard offsets
    # --- operators -------------------------------------------------
    ("functions/sketch.py", "cms_estimate"),     # k-row probe tokens
    ("operators/dedup.py", "decontaminate"),     # dict eval shingles
    ("operators/dedup.py", "delta_jaccard_pairs"),  # new-batch shingles
    ("operators/dedup.py", "embedding_ivf_topk"),   # k centroids
    ("operators/dedup.py", "embedding_lsh_topk"),   # bounded-Q queries
    ("operators/dedup.py", "embedding_near_dups_bruteforce"),  # capped side
    ("operators/dedup.py", "embedding_topk"),    # bounded-Q queries ×2
    ("operators/dedup.py", "jaccard_pairs"),     # k-row stop-shingle ids
    ("operators/dedup.py", "minhash_lsh_dups"),  # k-row stop-band ids
    ("operators/dedup.py", "ppjoin_pairs"),      # dict prefix tokens
    ("operators/search.py", "bm25_scores"),      # scalar + dict query df
    ("operators/search.py", "phrase_search"),    # dict phrase terms
    ("operators/search.py", "stratum_tv_pairs"), # scalar stratum sizes ×2
    ("operators/spatial.py", "_rank_with_exact_fallback"),  # k-row fallback ids
    ("operators/spatial.py", "_with_moments"),   # scalar global moments
    ("operators/spatial.py", "areal_disaggregate"),  # covering ×2
    ("operators/spatial.py", "bilinear_dem_join"),   # grid DEM tiles
    ("operators/spatial.py", "clark_evans"),     # scalar
    ("operators/spatial.py", "cross_ripley_k"),  # scalar class counts
    ("operators/spatial.py", "dem_elevation_fix"),   # grid DEM tiles
    ("operators/spatial.py", "emerging_hotspots"),   # scalar epoch stats
    ("operators/spatial.py", "gravity_residuals"),   # scalar + margins ×3
    ("operators/spatial.py", "hausdorff_cell_pairs"),  # k-row capped cells
    ("operators/spatial.py", "hex_knn_join"),    # k-row fallback ids
    ("operators/spatial.py", "join_counts_median_thr"),  # scalar median ×2
    ("operators/spatial.py", "knn_join"),        # query rings (bounded-Q)
    ("operators/spatial.py", "knox_statistic"),  # scalar ×1 (1-row counts)
    ("operators/spatial.py", "map_match_join"),  # covering (road segments)
    ("operators/spatial.py", "nn_gfunction"),    # scalar
    ("operators/spatial.py", "point_in_polygon_anti"),  # covering
    ("operators/spatial.py", "point_in_polygon_join"),  # covering
    ("operators/spatial.py", "quadrat_test"),    # scalar
    ("operators/spatial.py", "ripley_k"),        # scalar
    ("operators/spatial.py", "within_radius_join"),  # covering
    ("operators/timeseries.py", "interval_join"),    # covering (intervals)
    ("plans/checkpoint.py", "resume_pending"),   # k-row done partitions
    ("sources/gpx.py", "scan_tracks"),           # k-row file-rank offsets
}


def _sites() -> set[tuple[str, str]]:
    """AST-level scan: actual ``broadcast(...)`` Call nodes only (the
    name appearing in docstrings or comments does not count)."""
    found = set()
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, PKG)
            tree = ast.parse(open(path).read())
            hits = []
            for node in ast.walk(tree):
                if not isinstance(node, ast.Call):
                    continue
                fn = node.func
                name = (
                    fn.attr if isinstance(fn, ast.Attribute)
                    else fn.id if isinstance(fn, ast.Name)
                    else None
                )
                if name == "broadcast":
                    hits.append(node.lineno)
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
                found.add((rel, encl))
    return found


def test_forced_broadcast_sites_match_reviewed_inventory():
    found = _sites()
    extra = found - ALLOWED
    missing = ALLOWED - found
    assert not extra, (
        f"new forced-broadcast sites (review the bound, then add here): {sorted(extra)}"
    )
    assert not missing, f"stale allowlist entries: {sorted(missing)}"
