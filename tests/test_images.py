"""E7 image payload: codec correctness, per-row invariant, phash dedup."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def test_png_roundtrip_exact():
    from gotrackmaster_spark.functions.png import decode_png, encode_png
    from gotrackmaster_spark.operators.images import gen_pixels

    px = gen_pixels(7, 40, 16)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_foreign_filters_decode():
    """Decoder must handle filters 1-4 (foreign encoders use them)."""
    import struct
    import zlib

    from gotrackmaster_spark.functions.png import _SIG, _chunk, decode_png
    from gotrackmaster_spark.operators.images import gen_pixels

    px = gen_pixels(3, 8, 6)
    h, w, _ = px.shape
    flat = px.reshape(h, w * 3).astype(np.int32)
    raws = []
    for y in range(h):
        ftype = y % 5
        prev = flat[y - 1] if y > 0 else np.zeros(w * 3, dtype=np.int32)
        cur = flat[y]
        enc = np.zeros(w * 3, dtype=np.int32)
        for x in range(w * 3):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        raws.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)


def test_roundtrip_invariant_all_rows(spark):
    """input_hint invariant: decoded-pixel allclose (PSNR>=40 for lossy)
    + caption equality on every row."""
    from gotrackmaster_spark.operators.images import roundtrip_check, synthesize_images

    imgs = synthesize_images(spark, SF_DIR, w=32, h=24)
    res = roundtrip_check(imgs).collect()
    assert len(res) == 500
    assert all(r.invariant_ok and r.caption_ok for r in res)
    lossy = [r for r in res if r.fmt == "qnt4"]
    assert lossy and all(40.0 <= r.psnr_vs_source < 60.0 for r in lossy)
    lossless = [r for r in res if r.fmt in ("raw", "png")]
    assert lossless and all(r.psnr_vs_source == float("inf") for r in lossless)


def test_caption_equality_roundtrip(spark):
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.images import synthesize_images

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    imgs = synthesize_images(spark, SF_DIR)
    j = imgs.withColumn("doc_id", F.col("img_key")).join(docs, "doc_id")
    assert j.filter(F.col("caption") != F.col("text")).count() == 0


def test_phash_identical_pixels_same_hash(spark):
    from gotrackmaster_spark.operators.images import gen_pixels, phash64

    a = phash64(gen_pixels(11, 32, 24))
    b = phash64(gen_pixels(11, 32, 24))
    c = phash64(gen_pixels(12, 32, 24))
    assert a == b
    assert isinstance(a, int)
    assert a != c  # pseudo-random pixels: equal hashes would be a bug smell


def test_phash_near_dups_pigeonhole(spark):
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.images import phash_near_dups, synthesize_images

    imgs = synthesize_images(spark, SF_DIR).limit(120).cache()
    fast = {
        (r.a_id, r.b_id, r.hamming)
        for r in phash_near_dups(imgs, max_hamming=20).collect()
    }
    sig = imgs.select("image_id", "phash")
    a = sig.select(F.col("image_id").alias("a_id"), F.col("phash").alias("a_ph"))
    b = sig.select(F.col("image_id").alias("b_id"), F.col("phash").alias("b_ph"))
    ham = F.bit_count(F.col("a_ph").bitwiseXOR(F.col("b_ph"))).cast("int")
    brute = {
        (r.a_id, r.b_id, r.hamming)
        for r in a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", ham).filter(F.col("hamming") <= 20).collect()
    }
    assert fast == brute


def test_image_variants_are_planted_near_dups(spark):
    """Every variant goes through decode → bump → re-encode and must land
    within a few Hamming bits of its base; the payload itself must still
    decode to exactly the bumped pixels (lossless for raw/png; qnt4 bytes
    re-encode losslessly because the bump preserves multiples of 4)."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.images import (
        decode_image,
        phash64,
        synthesize_image_variants,
        synthesize_images,
    )

    imgs = synthesize_images(spark, SF_DIR).limit(60).cache()
    var = synthesize_image_variants(imgs, every=5)
    j = (
        imgs.select(F.col("img_key").alias("k"), F.col("phash").alias("base_ph"))
        .join(var, F.col("k") == F.col("img_key"))
        .select("img_key", "base_ph", "phash", "bytes", "w", "h", "fmt")
    )
    rows = j.collect()
    assert rows, "no variants produced"
    for r in rows:
        ham = bin((r.base_ph ^ r.phash) & (2**64 - 1)).count("1")
        assert ham <= 12, f"variant too far from base: {ham}"
        px = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        assert phash64(px) == r.phash  # payload round-trips to its own hash
    imgs.unpersist()


def test_images_table_checkpoint_cell_layout(spark, tmp_path):
    """North-rule input shape end-to-end: the image+caption table, cell
    indexed, written cell-range-partitioned through the snapshot catalog,
    reloaded, and its payload invariant re-verified.  Each output file
    must cover a TIGHT cell range (Z-order locality → file-level pruning)."""
    import glob

    from pyspark.sql import functions as F

    from gotrackmaster_spark.functions.cells import cell_col
    from gotrackmaster_spark.operators.images import roundtrip_check, synthesize_images
    from gotrackmaster_spark.operators.skew import repartition_by_cell_range
    from gotrackmaster_spark.plans.checkpoint import Catalog

    cat = Catalog(str(tmp_path))
    imgs = synthesize_images(spark, SF_DIR).withColumn(
        "cell", cell_col(F.col("lat"), F.col("lon"), 12)
    )
    laid_out = repartition_by_cell_range(imgs, "cell", 8)
    m = cat.commit(laid_out, "images")
    assert m["total_rows"] == 500

    back = cat.load(spark, "images")
    assert back.count() == 500
    res = roundtrip_check(back).collect()
    assert all(r.invariant_ok for r in res)

    # Z-order layout: per-file cell spread far below the global spread
    files = glob.glob(f"{m['data_dir']}/*.parquet")
    assert len(files) >= 4
    glob_min, glob_max = back.agg(F.min("cell"), F.max("cell")).first()
    spreads = []
    for f in files:
        mn, mx = spark.read.parquet(f).agg(F.min("cell"), F.max("cell")).first()
        if mn is not None:
            spreads.append((mx - mn) / (glob_max - glob_min))
    assert sorted(spreads)[len(spreads) // 2] < 0.5  # median file is tight


def _ssim_np(a, b):
    """Reference global SSIM (population variances) straight from numpy."""
    x = a.reshape(-1).astype(np.float64)
    y = b.reshape(-1).astype(np.float64)
    mx, my = x.mean(), y.mean()
    vx = (x * x).mean() - mx * mx
    vy = (y * y).mean() - my * my
    cov = (x * y).mean() - mx * my
    return ((2 * mx * my + 6.5025) * (2 * cov + 58.5225)) / (
        (mx * mx + my * my + 6.5025) * (vx + vy + 58.5225)
    )


def _ssim_pairs(spark, rows):
    from gotrackmaster_spark.operators.images import pairwise_ssim

    df = spark.createDataFrame(
        rows,
        "pair_id string, bytes_a binary, bytes_b binary, w int, h int, "
        "fmt_a string, fmt_b string",
    )
    return {r["pair_id"]: r for r in pairwise_ssim(df).collect()}


def test_pairwise_ssim_identity_symmetry_and_reference(spark):
    from gotrackmaster_spark.operators.images import (
        decode_image,
        encode_image,
        gen_pixels,
    )

    rows = []
    expected = {}
    for key, fmt in [(3, "raw"), (4, "png"), (5, "qnt4"), (11, "qnt4")]:
        px = gen_pixels(key, 16, 8)
        other = gen_pixels(key + 1, 16, 8)
        ea, eb = encode_image(px, fmt), encode_image(other, fmt)
        da = decode_image(ea, 16, 8, fmt)
        db = decode_image(eb, 16, 8, fmt)
        rows.append((f"id{key}", ea, ea, 16, 8, fmt, fmt))
        expected[f"id{key}"] = _ssim_np(da, da)
        rows.append((f"ab{key}", ea, eb, 16, 8, fmt, fmt))
        rows.append((f"ba{key}", eb, ea, 16, 8, fmt, fmt))
        expected[f"ab{key}"] = _ssim_np(da, db)
        expected[f"ba{key}"] = _ssim_np(db, da)
    got = _ssim_pairs(spark, rows)
    for key in (3, 4, 5, 11):
        assert got[f"id{key}"]["ssim"] == 1.0          # identical payloads
        assert got[f"ab{key}"]["ssim"] == got[f"ba{key}"]["ssim"]  # symmetric
    for pid, exp in expected.items():
        assert abs(got[pid]["ssim"] - exp) < 1e-12, pid


def test_pairwise_ssim_discriminates_variants_from_strangers(spark):
    """A planted near-dup variant must score far above an unrelated image
    — SSIM is the verifier behind the phash candidate cut."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.images import (
        pairwise_ssim,
        synthesize_image_variants,
        synthesize_images,
    )

    imgs = synthesize_images(spark, SF_DIR).limit(40).cache()
    var = synthesize_image_variants(imgs, every=5)
    base = imgs.select(
        "img_key",
        F.col("image_id").alias("pair_id"),
        F.col("bytes").alias("bytes_a"),
        "w",
        "h",
        F.col("fmt").alias("fmt_a"),
    )
    near = base.join(
        var.select("img_key", F.col("bytes").alias("bytes_b"), F.col("fmt").alias("fmt_b")),
        "img_key",
    ).drop("img_key")
    near_scores = [r["ssim"] for r in pairwise_ssim(near).collect()]
    assert near_scores and all(s >= 0.99 for s in near_scores)

    # stranger pair: two different base images, same fmt
    two = sorted(
        imgs.filter(F.col("img_key") % 3 == 0).collect(),  # raw-format rows
        key=lambda r: r.img_key,
    )[:2]
    a, b = two
    far = _ssim_pairs(
        spark, [("far", a.bytes, b.bytes, a.w, a.h, a.fmt, b.fmt)]
    )["far"]["ssim"]
    assert far < 0.5 < min(near_scores)
    imgs.unpersist()


def _glcm_brute(flat, n_levels=16, quant=10**9):
    div = 256 // n_levels
    lev = [p // div for p in flat]
    pairs = list(zip(lev[:-3], lev[3:]))
    from collections import Counter

    cm = Counter(pairs)
    return {
        "n_pairs": len(pairs),
        "contrast": sum(c * (p - q) ** 2 for (p, q), c in cm.items()),
        "diag_pairs": sum(c for (p, q), c in cm.items() if p == q),
        "energy_sq": sum(c * c for c in cm.values()),
        "hom_q": sum(c * (quant // (1 + (p - q) ** 2)) for (p, q), c in cm.items()),
    }


def test_glcm_stats_matches_brute_force_all_formats(spark):
    """GLCM features must equal a per-image Python replay of the decoded
    pixels for raw, png and qnt4 payloads alike."""
    from gotrackmaster_spark.operators.images import (
        decode_image,
        glcm_stats,
        synthesize_images,
    )

    imgs = synthesize_images(spark, SF_DIR).limit(12).cache()
    rows = {r["image_id"]: r for r in imgs.collect()}
    got = {r["image_id"]: r for r in glcm_stats(imgs).collect()}
    assert set(got) == set(rows) and len(got) == 12
    fmts_seen = set()
    for iid, src in rows.items():
        px = decode_image(src.bytes, src.w, src.h, src.fmt)
        exp = _glcm_brute(px.reshape(-1).astype(int).tolist())
        g = got[iid]
        assert g["fmt"] == src.fmt
        fmts_seen.add(src.fmt)
        for k, v in exp.items():
            assert g[k] == v, (iid, k)
    assert fmts_seen == {"raw", "png", "qnt4"}
    imgs.unpersist()


def test_glcm_discriminates_smooth_from_noisy(spark):
    """A constant image is all-diagonal (contrast 0, homogeneity 1);
    the pseudo-random generator image is textured."""
    from gotrackmaster_spark.operators.images import gen_pixels, glcm_stats

    w, h = 16, 8
    smooth = np.full((h, w, 3), 77, dtype=np.uint8)
    noisy = gen_pixels(5, w, h)
    df = spark.createDataFrame(
        [
            ("smooth", smooth.tobytes(), w, h, "raw"),
            ("noisy", noisy.tobytes(), w, h, "raw"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    got = {r["image_id"]: r for r in glcm_stats(df).collect()}
    n = w * h * 3 - 3
    s = got["smooth"]
    assert (s["n_pairs"], s["contrast"], s["diag_pairs"]) == (n, 0, n)
    assert s["hom_q"] == n * 10**9 and s["energy_sq"] == n * n
    z = got["noisy"]
    assert z["contrast"] > 0 and z["diag_pairs"] < n and z["hom_q"] < n * 10**9


def test_glcm_degenerate_and_validation(spark):
    from gotrackmaster_spark.operators.images import glcm_stats
    import pytest as _pt

    # a 1x1 image has 3 bytes -> no +3 pair -> all-zero features
    df = spark.createDataFrame(
        [("tiny", bytes([1, 2, 3]), 1, 1, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    got = glcm_stats(df).collect()[0]
    assert (got["n_pairs"], got["contrast"], got["diag_pairs"],
            got["energy_sq"], got["hom_q"]) == (0, 0, 0, 0, 0)
    with _pt.raises(ValueError):
        glcm_stats(df, n_levels=10)
    with _pt.raises(ValueError):
        glcm_stats(df, quant=0)


def test_image_moments_brute_force_all_formats(spark):
    """Six raw luma moments must equal a per-image Python replay of the
    decoded pixels for raw, png and qnt4 payloads alike."""
    from gotrackmaster_spark.operators.images import (
        decode_image,
        image_moments,
        synthesize_images,
    )

    imgs = synthesize_images(spark, SF_DIR).limit(9).cache()
    rows = {r["image_id"]: r for r in imgs.collect()}
    got = {r["image_id"]: r for r in image_moments(imgs).collect()}
    assert set(got) == set(rows)
    for iid, src in rows.items():
        px = decode_image(src.bytes, src.w, src.h, src.fmt).astype(int)
        exp = {"m00": 0, "m10": 0, "m01": 0, "m20": 0, "m02": 0, "m11": 0}
        for y in range(src.h):
            for x in range(src.w):
                r, g, b = px[y, x]
                l = (299 * r + 587 * g + 114 * b) // 1000
                exp["m00"] += l
                exp["m10"] += x * l
                exp["m01"] += y * l
                exp["m20"] += x * x * l
                exp["m02"] += y * y * l
                exp["m11"] += x * y * l
        for k, v in exp.items():
            assert got[iid][k] == v, (iid, k)
    imgs.unpersist()


def test_image_moments_centroid_and_mixed_sizes(spark):
    """A single bright pixel puts the centroid exactly on it; mixed
    (w, h) rows in one batch must not cross-contaminate."""
    from gotrackmaster_spark.operators.images import image_moments

    w1, h1 = 8, 4
    a = np.zeros((h1, w1, 3), dtype=np.uint8)
    a[2, 5] = 255  # luma (299+587+114)*255//1000 = 255 exactly
    w2, h2 = 4, 4
    b = np.full((h2, w2, 3), 10, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            ("dot", a.tobytes(), w1, h1, "raw"),
            ("flat", b.tobytes(), w2, h2, "raw"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    got = {r["image_id"]: r for r in image_moments(df).collect()}
    d = got["dot"]
    assert (d["m00"], d["m10"], d["m01"]) == (255, 5 * 255, 2 * 255)
    assert (d["m20"], d["m02"], d["m11"]) == (25 * 255, 4 * 255, 10 * 255)
    f = got["flat"]
    # uniform image: centroid at the exact coordinate mean
    assert f["m10"] / f["m00"] == sum(range(w2)) / w2
    assert f["m01"] / f["m00"] == sum(range(h2)) / h2
    # all-black image: zero mass
    z = np.zeros((2, 2, 3), dtype=np.uint8)
    df0 = spark.createDataFrame(
        [("black", z.tobytes(), 2, 2, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    g0 = image_moments(df0).collect()[0]
    assert all(g0[k] == 0 for k in ("m00", "m10", "m01", "m20", "m02", "m11"))


def test_shared_blocks_plants_and_brute_force(spark):
    """doc k and k+256 decode to identical pixels (31*256 = 0 mod 256);
    shared-block signatures must find exactly the non-qnt4 pairs, and
    every signature must match a Python replay."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.images import (
        decode_image,
        shared_blocks,
        synthesize_images,
    )

    imgs = synthesize_images(spark, "/root/testdata/sf0.01").filter(
        F.col("img_key").isin([0, 1, 2, 256, 257, 258, 7])
    ).cache()
    rows = imgs.collect()
    # python replay of all block signatures
    sigs = {}
    for r in rows:
        px = decode_image(r.bytes, r.w, r.h, r.fmt).astype(int)
        for by in range(r.h // 8):
            for bx in range(r.w // 8):
                blk = px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8, :].reshape(-1)
                s0 = int(blk.sum())
                s1 = int((blk * np.arange(1, len(blk) + 1)).sum())
                sigs.setdefault((s0, s1), set()).add(r.image_id)
    exp = {
        k: (sum(1 for r in rows for by in range(r.h // 8) for bx in range(r.w // 8)
                if _blk_sig(decode_image(r.bytes, r.w, r.h, r.fmt), bx, by) == k),
            len(v))
        for k, v in sigs.items() if len(v) >= 2
    }
    # drop_constant=False: this test pins the RAW signature math; the
    # constant-block pre-filter has its own planted-letterbox test below
    got = {
        (r["sig0"], r["sig1"]): (r["n_blocks"], r["n_imgs"])
        for r in shared_blocks(imgs, drop_constant=False).collect()
    }
    assert got == exp
    # the planted pair: keys 0 (raw) & 256 (png) decode identically, and
    # the generator's 768·by ≡ 0 (mod 256) row stride makes same-COLUMN
    # blocks repeat — so the pair shares exactly 4 distinct column
    # signatures, each spanning 3+3 blocks of the 2 images.  1 (png) vs
    # 257 (qnt4) and 2 (qnt4) vs 258 (raw) must NOT match (quantized).
    assert len(got) == 4
    assert all(v == (6, 2) for v in got.values())
    imgs.unpersist()


def _blk_sig(px, bx, by):
    blk = px.astype(int)[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8, :].reshape(-1)
    return int(blk.sum()), int((blk * np.arange(1, len(blk) + 1)).sum())


def test_shared_blocks_constant_prefilter(spark):
    """Planted letterbox bars: every image shares a constant 8-row bar
    (one black, one mid-gray) — the hot signature keys.  With the
    default ``drop_constant=True`` they must vanish BEFORE the shuffle;
    the genuinely shared non-constant watermark block must survive."""
    from gotrackmaster_spark.operators.images import shared_blocks

    wm = (np.arange(8 * 8 * 3, dtype=np.uint8) * 7 % 251).reshape(8, 8, 3)
    rows = []
    for i in range(3):
        px = np.zeros((24, 16, 3), dtype=np.uint8)
        px[0:8, :, :] = 0        # black letterbox bar (2 constant blocks)
        px[8:16, :, :] = 17      # non-zero constant bar (2 more)
        px[16:24, 0:8, :] = wm   # shared non-constant watermark
        # unique non-constant filler so the last block never collides
        px[16:24, 8:16, :] = ((np.arange(8 * 8 * 3) * (i + 3)) % 256).reshape(
            8, 8, 3
        ).astype(np.uint8)
        rows.append((f"img{i}", px.tobytes(), 16, 24, "raw"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    n = 8 * 8 * 3
    got = {(r["sig0"], r["sig1"]): (r["n_blocks"], r["n_imgs"])
           for r in shared_blocks(df).collect()}
    # only the watermark signature survives
    blk = wm.reshape(-1).astype(int)
    wm_sig = (int(blk.sum()), int((blk * np.arange(1, n + 1)).sum()))
    assert got == {wm_sig: (3, 3)}
    assert all(2 * s1 != s0 * (n + 1) for s0, s1 in got)
    # with the filter off, both constant bars reappear as hot keys
    raw = {(r["sig0"], r["sig1"]): (r["n_blocks"], r["n_imgs"])
           for r in shared_blocks(df, drop_constant=False).collect()}
    assert raw[(0, 0)] == (6, 3)
    assert raw[(17 * n, 17 * n * (n + 1) // 2)] == (6, 3)
    assert raw[wm_sig] == (3, 3)


def test_shared_blocks_validation(spark):
    from gotrackmaster_spark.operators.images import shared_blocks
    import pytest as _pt

    df = spark.createDataFrame(
        [("odd", bytes(5 * 7 * 3), 5, 7, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    with _pt.raises(ValueError):
        shared_blocks(df, 0, 8)
    with _pt.raises(ValueError):
        shared_blocks(df, 8, 8, min_images=0)
    with _pt.raises(Exception, match="not divisible"):
        shared_blocks(df).collect()


def test_phash_topk_brute_force_and_contract(spark):
    """Band-join top-k must equal a brute-force hamming ranking over the
    same signatures; planted variants rank first for their base."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.images import (
        phash_topk,
        synthesize_image_variants,
        synthesize_images,
    )

    imgs = synthesize_images(spark, "/root/testdata/sf0.01").limit(60)
    cols = ["img_key", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    both = imgs.select(*cols).unionByName(
        synthesize_image_variants(imgs, every=5)
    ).cache()
    sig = {r["image_id"]: r["phash"] for r in both.select("image_id", "phash").collect()}
    queries = both.filter(
        (F.col("img_key") % 5 == 0) & F.col("image_id").startswith("img")
    )
    k, h = 4, 20
    got = {}
    rows = phash_topk(
        both.select("image_id", "phash"), queries.select("image_id", "phash"),
        k=k, max_hamming=h,
    ).collect()
    for r in rows:
        got.setdefault(r["q_id"], []).append((r["rnk"], r["b_id"], r["hamming"]))
    q_ids = {r["image_id"] for r in queries.select("image_id").collect()}
    m64 = (1 << 64) - 1  # phash bit 63 wraps signed: mask before popcount
    for q in q_ids:
        cands = sorted(
            (bin((sig[q] ^ p) & m64).count("1"), b)
            for b, p in sig.items()
            if b != q and bin((sig[q] ^ p) & m64).count("1") <= h
        )[:k]
        exp = [(i + 1, b, d) for i, (d, b) in enumerate(cands)]
        assert sorted(got.get(q, [])) == exp, q
    # discrimination: most queries see their planted variant in the top-k
    # (another base image may occasionally tie closer — that's fine)
    with_var = sum(
        1 for q in q_ids
        if any(b == "var" + q[3:] for _, b, _ in got.get(q, []))
    )
    assert with_var >= len(q_ids) // 2 > 0
    both.unpersist()

    import pytest as _pt

    with _pt.raises(ValueError):
        phash_topk(both.select("image_id", "phash"), queries.select("image_id", "phash"), k=0)


def test_orientation_hist_brute_force_and_octant_parity(spark):
    """Histogram must match a per-image Python replay whose octant comes
    from floor(atan2/45°) — proving the comparison arms ARE the octants;
    totals conserve: Σ octants + n_zero = usable positions."""
    import math as m

    from gotrackmaster_spark.operators.images import (
        decode_image,
        orientation_hist,
        synthesize_images,
    )

    imgs = synthesize_images(spark, "/root/testdata/sf0.001").limit(9).cache()
    rows = {r["image_id"]: r for r in imgs.collect()}
    got = {r["image_id"]: r for r in orientation_hist(imgs).collect()}
    for iid, src in rows.items():
        flat = decode_image(src.bytes, src.w, src.h, src.fmt).reshape(-1).astype(int)
        stride = 3 * src.w
        n = len(flat)
        exp = {f"o{k}": 0 for k in range(8)}
        exp["n_zero"] = 0
        mag2 = 0
        for i in range(n - stride):
            gx, gy = flat[i + 3] - flat[i], flat[i + stride] - flat[i]
            mag2 += gx * gx + gy * gy
            if gx == 0 and gy == 0:
                exp["n_zero"] += 1
            else:
                ang = m.degrees(m.atan2(gy, gx)) % 360.0
                exp[f"o{int(ang // 45.0) % 8}"] += 1
        g = got[iid]
        for k, v in exp.items():
            assert g[k] == v, (iid, k)
        assert g["mag2_sum"] == mag2
        assert sum(g[f"o{k}"] for k in range(8)) + g["n_zero"] == n - stride
    imgs.unpersist()


def test_image_center_bias_discriminates(spark):
    """A bright-center image scores >1, a bright-border one <1, flat =1;
    exact sums verified against a numpy replay over the decode chain."""
    from gotrackmaster_spark.driver_queries import q_image_center_bias

    rows = q_image_center_bias(spark, "/root/testdata/sf0.001").collect()
    assert rows
    from gotrackmaster_spark.operators.images import decode_image, synthesize_images

    imgs = {r["image_id"]: r for r in synthesize_images(spark, "/root/testdata/sf0.001").collect()}
    for r in rows[:8]:
        src = imgs[r["image_id"]]
        px = decode_image(src.bytes, src.w, src.h, src.fmt).astype(int)
        luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
        c = luma[src.h // 4:3 * src.h // 4, src.w // 4:3 * src.w // 4]
        assert r["sum_center"] == c.sum()
        assert r["sum_border"] == luma.sum() - c.sum()
        assert r["n_center"] == c.size and r["n_border"] == luma.size - c.size
        exp = (c.sum() / c.size) / ((luma.sum() - c.sum()) / (luma.size - c.size))
        assert abs(r["center_bias"] - exp) < 1e-12
