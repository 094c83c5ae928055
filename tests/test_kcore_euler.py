"""k-core peeling (python replay + pinned shapes) and image Euler
characteristic (crafted masks with known topology)."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


# ------------------------------------------------------------- k-core ---

def _peel_ref(pairs, k):
    """Classic iterate-to-fixpoint peel."""
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    changed = True
    while changed:
        changed = False
        for v in list(nbrs):
            if len(nbrs[v]) < k:
                for u in nbrs[v]:
                    nbrs[u].discard(v)
                del nbrs[v]
                changed = True
    return {v: len(s) for v, s in nbrs.items()}


def _run_kcore(spark, pairs, k, n_rounds=10):
    from gotrackmaster_spark.operators.graph import kcore_peel

    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {r.v: r.degree for r in kcore_peel(df, k=k, n_rounds=n_rounds).collect()}
    assert got == _peel_ref(pairs, k)
    return got


def test_clique_with_pendant_chain(spark):
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 10), (10, 11), (11, 12)]
    got = _run_kcore(spark, clique + chain, k=2)
    # the chain peels away end-in; the 4-clique survives as the 2-core
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_cascade_peel_needs_multiple_rounds(spark):
    # path 0-1-2-3-4: 2-core is empty, reached only by cascading rounds
    path = [(i, i + 1) for i in range(4)]
    assert _run_kcore(spark, path, k=2) == {}


def test_k3_on_two_triangles_sharing_edge(spark):
    # two triangles sharing an edge: every node has deg>=2; 3-core needs
    # deg>=3 — only the shared-edge nodes have 3, but after peeling the
    # wing nodes they drop to 1 → empty 3-core.
    pairs = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    assert _run_kcore(spark, pairs, k=3) == {}


# ------------------------------------------------------- Euler number ---

def _mask_image(spark, masks):
    """Build raw-format images from binary masks (fg=200, bg=0 gray)."""
    rows = []
    for i, m in enumerate(masks):
        m = np.asarray(m, dtype=np.uint8)
        h, w = m.shape
        px = np.repeat((m * 200)[:, :, None], 3, axis=2).astype(np.uint8)
        rows.append((f"m{i:02d}", px.tobytes(), w, h, "raw"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _eulers(spark, masks):
    from gotrackmaster_spark.operators.images import euler_stats

    out = euler_stats(_mask_image(spark, masks), thresh=128).collect()
    return {r.image_id: (r.n_fg, r.n_adj, r.n_quad, r.euler) for r in out}


def test_euler_known_topologies(spark):
    solid = np.ones((4, 5))                      # 1 component, 0 holes
    ring = np.ones((5, 5)); ring[2, 2] = 0       # 1 component, 1 hole
    two_dots = np.zeros((3, 5)); two_dots[1, 1] = two_dots[1, 3] = 1
    empty = np.zeros((3, 3))
    got = _eulers(spark, [solid, ring, two_dots, empty])
    assert got["m00"][3] == 1   # solid: χ = 1
    assert got["m01"][3] == 0   # ring:  1 comp − 1 hole = 0
    assert got["m02"] == (2, 0, 0, 2)  # two isolated dots: χ = 2
    assert got["m03"] == (0, 0, 0, 0)  # empty: χ = 0


def test_euler_term_arithmetic(spark):
    # 2×2 solid block: V=4, E=4, Q=1 → χ = 1
    block = np.zeros((4, 4)); block[1:3, 1:3] = 1
    got = _eulers(spark, [block])
    assert got["m00"] == (4, 4, 1, 1)


# ----------------------------------------------------- Haar energy ---

def test_haar_energy_constant_and_step(spark):
    """Constant image → zero detail at every level; a width-4 block
    wave concentrates energy at level 2 (detail = ±sum of 2-blocks)."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.images import luma_plane

    w, h = 16, 2
    const = np.full((h, w), 100, dtype=np.uint8)
    # blocks of 4: [4×200, 4×0] repeating — level-1 details cancel
    step = np.zeros((h, w), dtype=np.uint8)
    for x in range(w):
        if (x // 4) % 2 == 0:
            step[:, x] = 200
    rows = []
    for i, m in enumerate([const, step]):
        px = np.repeat(m[:, :, None], 3, axis=2).astype(np.uint8)
        rows.append((f"h{i:02d}", px.tobytes(), w, h, "raw"))
    imgs = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    lum = luma_plane(imgs)
    lv = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("level")
    expanded = lum.select("image_id", "x", "y", "l", lv)
    sign = F.when(
        F.expr("x % (1 << level) < (1 << (level - 1))"), F.lit(1)
    ).otherwise(F.lit(-1))
    detail = expanded.groupBy(
        "image_id", "level", "y", F.expr("x DIV (1 << level)").alias("b")
    ).agg(F.sum(sign * F.col("l")).alias("d"))
    en = {
        (r.image_id, r.level): r.e
        for r in detail.groupBy("image_id", "level")
        .agg(F.sum(F.col("d") * F.col("d")).alias("e"))
        .collect()
    }
    assert en[("h00", 1)] == en[("h00", 2)] == en[("h00", 3)] == 0
    assert en[("h01", 1)] == 0          # 2-pairs are constant
    assert en[("h01", 2)] == 0          # 4-blocks are constant
    assert en[("h01", 3)] > 0           # 8-blocks: 4×200 vs 4×0
    # exact value: per row 2 blocks, each detail = ±4·200 → 2·(800²)·h
    assert en[("h01", 3)] == 2 * (800 ** 2) * h
