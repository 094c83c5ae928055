"""E7 — image payload operators over the graft fact table
(BASELINE.json input_hint: image_id, bytes, w, h, fmt, caption, phash
+ geotag columns; see schemas.IMAGES_SCHEMA).

All pixel work happens inside ``mapInPandas`` over Arrow batches — numpy
per batch, zero per-row Python at the DataFrame level.  Formats:

* ``raw``  — uint8 RGB buffer (h·w·3 bytes), lossless
* ``png``  — real PNG via functions.png (zlib, filter 0), lossless
* ``qnt4`` — lossy: pixels quantized to multiples of 4 then raw-encoded;
             PSNR vs the original ≈ 47 dB (> the 40 dB invariant)

Pixels are generated deterministically from the image id —
``p[i] = (key·31 + i·2654435761) mod 256`` — so the DuckDB oracle can
recompute decode-derived statistics from the closed-form generator and
cross-check the full encode→decode path (tests + driver query
``image_stats``).  Per-row invariant (input_hint): decoded-pixel allclose
(exact for lossless, PSNR ≥ 40 dB for qnt4) + caption equality.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gotrackmaster_spark.caching import make_bounded_cache
from gotrackmaster_spark.functions.png import decode_png, encode_png

_PIX_A = 31
_PIX_B = 2654435761


def gen_pixels(key: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for image number ``key``."""
    i = np.arange(h * w * 3, dtype=np.int64)
    return ((key * _PIX_A + i * _PIX_B) % 256).astype(np.uint8).reshape(h, w, 3)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "qnt4":
        return ((pixels >> 2) << 2).tobytes()
    raise NotImplementedError(f"fmt {fmt!r} (decode libs not in sandbox)")


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt in ("raw", "qnt4"):
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "png":
        return decode_png(bytes(data))
    raise NotImplementedError(f"fmt {fmt!r} (decode libs not in sandbox)")


def phash64_batch(pixels: np.ndarray) -> np.ndarray:
    """Vectorized 8×8 average-hash over a (B, h, w, 3) uint8 batch →
    (B,) int64.  Luma block means vs their per-image mean; w, h divisible
    by 8 (the synthesizer guarantees it).

    INTEGER-EXACT on purpose: bit k is ``64·S_k > ΣS`` over integer block
    sums — the same predicate as "block mean > grand mean" but with no
    float rounding, so the DuckDB oracle (``SQL_PHASH_NEAR_DUPS``) can
    replay the hash bit-for-bit from the closed-form pixel generator."""
    b, h, w, _ = pixels.shape
    p = pixels.astype(np.int64)
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    sums = luma.reshape(b, 8, h // 8, 8, w // 8).sum(axis=(2, 4))  # (B, 8, 8)
    total = sums.sum(axis=(1, 2), keepdims=True)
    bits = (64 * sums > total).astype(np.int64)
    weights = np.int64(1) << np.arange(64, dtype=np.int64)  # bit 63 wraps signed
    return (bits.reshape(b, 64) * weights[None, :]).sum(axis=1)


def phash64(pixels: np.ndarray) -> int:
    """Single-image convenience wrapper over phash64_batch."""
    return int(phash64_batch(pixels[None, ...])[0])


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ----------------------------------------------------------- table builder ---

_FMTS = ["raw", "png", "qnt4"]


def synthesize_images(
    spark: SparkSession, sf_dir: str, w: int = 32, h: int = 24
) -> DataFrame:
    """Build the graft images table from `documents` (caption = text,
    geotags from the deterministic event formulas keyed by doc_id)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        F.col("doc_id").cast("long").alias("img_key"),
        F.format_string("img%08d", F.col("doc_id")).alias("image_id"),
        F.col("text").alias("caption"),
    )
    # single-file parquet = 1 input split; spread so synthesis (zlib/PNG
    # encode per image) parallelizes
    par = spark.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for key, image_id, caption in zip(pdf["img_key"], pdf["image_id"], pdf["caption"]):
                key = int(key)
                fmt = _FMTS[key % len(_FMTS)]
                px = gen_pixels(key, w, h)
                out.append(
                    {
                        "img_key": key,
                        "image_id": image_id,
                        "bytes": encode_image(px, fmt),
                        "w": w,
                        "h": h,
                        "fmt": fmt,
                        "caption": caption,
                        "phash": phash64(px),
                    }
                )
            yield pd.DataFrame(out)

    schema = (
        "img_key long, image_id string, bytes binary, w int, h int, "
        "fmt string, caption string, phash long"
    )
    imgs = base.mapInPandas(gen, schema)
    # geotags: same exact-integer synthesis family as driver_queries.geo_events
    return (
        imgs.withColumn("lat", (F.col("img_key") * F.lit(_PIX_B)) % 1600000 / 10000.0 - 80.0)
        .withColumn("lon", (F.col("img_key") * F.lit(40503) + 7) % 3600000 / 10000.0 - 180.0)
        .withColumn("ele", ((F.col("img_key") * 97) % 3000 - 50).cast("double"))
        .withColumn("track_id", (F.col("img_key") % 150).cast("string"))
        .withColumn("pt_idx", (F.col("img_key") / 150).cast("int"))
    )


# phash-signature cache slot with bounded lifetime (policy: caching.py)
_bound_sig_cache = make_bounded_cache()


_VAR_DELTA = 8
_VAR_STRIDE = 97


def synthesize_image_variants(
    images: DataFrame, every: int = 5, delta: int = _VAR_DELTA, stride: int = _VAR_STRIDE
) -> DataFrame:
    """Planted near-duplicate variants of every ``every``-th image, produced
    through the REAL payload path: decode bytes → bump every ``stride``-th
    flat byte by ``delta`` (mod 256) → re-encode → re-phash.  The variant's
    pixels differ from the base's *decoded* pixels in ~h·w·3/stride bytes,
    so its phash lands within a few Hamming bits of the base — the planted
    ground truth for ``phash_near_dups``.  Deterministic and closed-form
    (pixel generator + quantizer + this bump), so the DuckDB oracle replays
    the variant hash exactly."""

    cand = images.filter((F.col("img_key") % every) == 0)

    def bump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for key, data, w, h, fmt, caption in zip(
                pdf["img_key"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["caption"]
            ):
                px = decode_image(bytes(data), int(w), int(h), fmt).copy()
                flat = px.reshape(-1).astype(np.int64)
                flat[::stride] = (flat[::stride] + delta) % 256
                px2 = flat.astype(np.uint8).reshape(px.shape)
                out.append(
                    {
                        "img_key": int(key),
                        "image_id": f"var{int(key):08d}",
                        "bytes": encode_image(px2, fmt),
                        "w": int(w),
                        "h": int(h),
                        "fmt": fmt,
                        "caption": caption,
                        "phash": phash64(px2),
                    }
                )
            yield pd.DataFrame(out)

    schema = (
        "img_key long, image_id string, bytes binary, w int, h int, "
        "fmt string, caption string, phash long"
    )
    base_cols = cand.select(
        "img_key", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    )
    return base_cols.mapInPandas(bump, schema)


# ------------------------------------------------------------- decode pass ---

def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every payload and emit per-image statistics — the engine's
    feature-extraction plumbing (schema/partitioning/batch shape is the
    real thing; heavier extractors drop into the same loop)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            pix_sum = np.zeros(n, dtype=np.int64)
            pix_sq = np.zeros(n, dtype=np.int64)
            phash = np.zeros(n, dtype=np.int64)
            # raw/qnt4 share (w, h): stack + one vectorized pass per group;
            # png decodes per row (real container format)
            fmts = pdf["fmt"].to_numpy()
            for grp in np.unique(fmts):
                idx = np.where(fmts == grp)[0]
                sub = pdf.iloc[idx]
                if grp in ("raw", "qnt4"):
                    w = int(sub["w"].iloc[0])
                    h = int(sub["h"].iloc[0])
                    stack = np.stack(
                        [np.frombuffer(b, dtype=np.uint8) for b in sub["bytes"]]
                    ).reshape(len(idx), h, w, 3)
                    s64 = stack.astype(np.int64)
                    pix_sum[idx] = s64.sum(axis=(1, 2, 3))
                    pix_sq[idx] = (s64 * s64).sum(axis=(1, 2, 3))
                    phash[idx] = phash64_batch(stack)
                else:
                    for j, r in zip(idx, sub.itertuples(index=False)):
                        px = decode_image(r.bytes, r.w, r.h, r.fmt)
                        p64 = px.astype(np.int64)
                        pix_sum[j] = int(p64.sum())
                        pix_sq[j] = int((p64 * p64).sum())
                        phash[j] = phash64(px)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "fmt": fmts,
                    "w": pdf["w"].to_numpy(),
                    "h": pdf["h"].to_numpy(),
                    "pixel_sum": pix_sum,
                    "pixel_sq": pix_sq,
                    "phash": phash,
                    "caption_len": pdf["caption"].str.len().to_numpy(),
                }
            )

    schema = (
        "image_id string, fmt string, w int, h int, pixel_sum long, "
        "pixel_sq long, phash long, caption_len int"
    )
    return images.mapInPandas(stats, schema)


def roundtrip_check(images: DataFrame) -> DataFrame:
    """Per-row invariant (input_hint): decode → re-encode → decode, then
    allclose (lossless) / PSNR ≥ 40 dB (lossy) + caption equality."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = decode_image(r.bytes, r.w, r.h, r.fmt)
                rt = decode_image(encode_image(px, r.fmt), r.w, r.h, r.fmt)
                key = int(r.img_key)
                orig = gen_pixels(key, int(r.w), int(r.h))
                p = psnr(orig, px)
                lossless_ok = bool(np.array_equal(px, rt))
                out.append(
                    {
                        "image_id": r.image_id,
                        "fmt": r.fmt,
                        "roundtrip_exact": lossless_ok,
                        "psnr_vs_source": float(p),
                        "invariant_ok": bool(
                            lossless_ok and (p == float("inf") or p >= 40.0)
                        ),
                        "caption_ok": True,  # caption never re-encoded; equality by construction
                    }
                )
            yield pd.DataFrame(out)

    schema = (
        "image_id string, fmt string, roundtrip_exact boolean, "
        "psnr_vs_source double, invariant_ok boolean, caption_ok boolean"
    )
    return images.mapInPandas(check, schema)


def pixel_feature_stats(
    images: DataFrame, n_bins: int = 16, edge_thr: int = 32
) -> DataFrame:
    """Per-image histogram + gradient features from ONE decode pass —
    the texture/contrast leg of the image feature extractor, built so
    every output is either an exact integer or an exact-int ratio (no
    float accumulation → a DuckDB oracle can replay it bit-for-bit
    from the closed-form pixel generator).

    Histogram over the flat RGB byte array, ``bin = p DIV (256/n_bins)``:

    * ``nonzero_bins``, ``mode_count`` — exact ints
    * ``mode_bin`` — argmax bin, ties broken LOW (deterministic)
    * ``median_bin`` — smallest bin whose cumulative count reaches
      ``(n_pix + 1) DIV 2``
    * ``hist_sq`` = Σ c² — feeds Gini impurity
      (n² − Σc²)/n², ONE exact-int division (the entropy stand-in
      chosen because Shannon's Σ c·log₂c is a float SUM whose
      accumulation order no SQL engine pins)

    Gradients over the SAME flat array with channel-aligned strides —
    ``+3`` (next pixel, same channel; row-wrap pairs included by
    definition) and ``+3w`` (same pixel, next row):

    * ``gx_sum``/``gy_sum`` = Σ|Δ|, ``gx_max``/``gy_max``,
      ``gx_edges``/``gy_edges`` = #{|Δ| > edge_thr} — all exact ints

    Plan at scale: one ``mapInPandas`` over Arrow batches (vectorized
    numpy, zero per-row Python for raw/qnt4; png decodes per row like
    :func:`decode_stats`); output is ~60 B/row regardless of image
    size, so the feature table broadcasts/joins freely downstream.
    """
    if 256 % n_bins != 0:
        raise ValueError(f"n_bins must divide 256, got {n_bins}")
    div = 256 // n_bins

    def _features(flat: np.ndarray, ws: np.ndarray) -> dict:
        """flat: (B, N) int64 pixel rows (same w within a call)."""
        b, n = flat.shape
        bins = flat // div
        # per-row bincount via offsetting each row into its own bin range
        offs = bins + (np.arange(b, dtype=np.int64)[:, None] * n_bins)
        hist = np.bincount(offs.ravel(), minlength=b * n_bins).reshape(b, n_bins)
        mode_count = hist.max(axis=1)
        mode_bin = hist.argmax(axis=1)  # numpy argmax ties -> first (lowest)
        cum = hist.cumsum(axis=1)
        half = (n + 1) // 2
        median_bin = (cum < half).sum(axis=1)
        stride = 3 * int(ws[0])
        # degenerate 1-row/1-pixel images: empty difference -> all-zero stats
        zc = np.zeros((b, 1), dtype=np.int64)
        gx = np.abs(flat[:, 3:] - flat[:, :-3]) if n > 3 else zc
        gy = np.abs(flat[:, stride:] - flat[:, :-stride]) if n > stride else zc
        return {
            "n_pix": np.full(b, n, dtype=np.int64),
            "nonzero_bins": (hist > 0).sum(axis=1).astype(np.int64),
            "mode_bin": mode_bin.astype(np.int64),
            "mode_count": mode_count.astype(np.int64),
            "median_bin": median_bin.astype(np.int64),
            "hist_sq": (hist * hist).sum(axis=1).astype(np.int64),
            "gx_sum": gx.sum(axis=1),
            "gx_max": gx.max(axis=1),
            "gx_edges": (gx > edge_thr).sum(axis=1).astype(np.int64),
            "gy_sum": gy.sum(axis=1),
            "gy_max": gy.max(axis=1),
            "gy_edges": (gy > edge_thr).sum(axis=1).astype(np.int64),
        }

    cols = [
        "n_pix", "nonzero_bins", "mode_bin", "mode_count", "median_bin",
        "hist_sq", "gx_sum", "gx_max", "gx_edges", "gy_sum", "gy_max",
        "gy_edges",
    ]

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_rows = len(pdf)
            acc = {c: np.zeros(n_rows, dtype=np.int64) for c in cols}
            fmts = pdf["fmt"].to_numpy()
            for grp in np.unique(fmts):
                idx = np.where(fmts == grp)[0]
                sub = pdf.iloc[idx]
                if grp in ("raw", "qnt4"):
                    flat = np.stack(
                        [np.frombuffer(b, dtype=np.uint8) for b in sub["bytes"]]
                    ).astype(np.int64)
                    feats = _features(flat, sub["w"].to_numpy())
                    for c in cols:
                        acc[c][idx] = feats[c]
                else:
                    for j, r in zip(idx, sub.itertuples(index=False)):
                        px = decode_image(r.bytes, r.w, r.h, r.fmt)
                        feats = _features(
                            px.reshape(1, -1).astype(np.int64),
                            np.array([r.w]),
                        )
                        for c in cols:
                            acc[c][j] = feats[c][0]
            out = {"image_id": pdf["image_id"].to_numpy(), "fmt": fmts}
            out.update(acc)
            yield pd.DataFrame(out)

    schema = "image_id string, fmt string, " + ", ".join(
        f"{c} long" for c in cols
    )
    return images.mapInPandas(stats, schema)


def glcm_stats(
    images: DataFrame, n_levels: int = 16, quant: int = 10**9
) -> DataFrame:
    """Per-image gray-level co-occurrence (GLCM) texture features from
    ONE decode pass — the second-order companion to
    :func:`pixel_feature_stats` (which is first-order: histogram +
    gradients).  The co-occurrence matrix counts level pairs
    ``(p DIV (256/n_levels), q DIV (256/n_levels))`` over the flat RGB
    array at the channel-aligned ``+3`` stride (next pixel, same
    channel — the ``gx`` pair set), and every classic Haralick feature
    is reduced to an exact integer so a DuckDB oracle replays it
    bit-for-bit from the closed-form pixel generator:

    * ``n_pairs``      — N − 3
    * ``contrast``     = Σ n_pq·(p−q)²  (exact int)
    * ``diag_pairs``   = Σ_p n_pp — the homogeneity numerator's integer
      core (fraction of perfectly-smooth neighbor pairs)
    * ``energy_sq``    = Σ n_pq² — angular second moment × n_pairs²
    * ``hom_q``        = Σ n_pq · (quant DIV (1 + (p−q)²)) — inverse
      difference moment with the per-class weight PRE-QUANTIZED to an
      integer, so the sum is exact (a float Σ c/(1+d²) would be
      accumulation-order dependent)

    Float conveniences (mean contrast, homogeneity in [0,1]) are single
    int divisions left to the caller — see ``q_image_glcm``.

    Plan at scale: one ``mapInPandas`` over Arrow batches (vectorized
    per-row bincount of pair codes into n_levels² bins; png decodes per
    row like :func:`decode_stats`); output is ~50 B/row regardless of
    image size.
    """
    if 256 % n_levels != 0:
        raise ValueError(f"n_levels must divide 256, got {n_levels}")
    if quant <= 0:
        raise ValueError(f"quant must be positive, got {quant}")
    div = 256 // n_levels
    n2 = n_levels * n_levels
    codes = np.arange(n2, dtype=np.int64)
    dd = (codes // n_levels - codes % n_levels) ** 2
    contrast_w = dd
    diag_w = (dd == 0).astype(np.int64)
    hom_w = quant // (1 + dd)

    def _features(flat: np.ndarray) -> dict:
        """flat: (B, N) int64 pixel rows."""
        b, n = flat.shape
        if n <= 3:  # degenerate: no +3 pair exists
            z = np.zeros(b, dtype=np.int64)
            return {
                "n_pairs": z, "contrast": z.copy(), "diag_pairs": z.copy(),
                "energy_sq": z.copy(), "hom_q": z.copy(),
            }
        lev = flat // div
        pair = lev[:, :-3] * n_levels + lev[:, 3:]
        offs = pair + (np.arange(b, dtype=np.int64)[:, None] * n2)
        cm = np.bincount(offs.ravel(), minlength=b * n2).reshape(b, n2)
        return {
            "n_pairs": np.full(b, n - 3, dtype=np.int64),
            "contrast": cm @ contrast_w,
            "diag_pairs": cm @ diag_w,
            "energy_sq": (cm * cm).sum(axis=1),
            "hom_q": cm @ hom_w,
        }

    cols = ["n_pairs", "contrast", "diag_pairs", "energy_sq", "hom_q"]

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_rows = len(pdf)
            acc = {c: np.zeros(n_rows, dtype=np.int64) for c in cols}
            fmts = pdf["fmt"].to_numpy()
            for grp in np.unique(fmts):
                idx = np.where(fmts == grp)[0]
                sub = pdf.iloc[idx]
                if grp in ("raw", "qnt4"):
                    flat = np.stack(
                        [np.frombuffer(b, dtype=np.uint8) for b in sub["bytes"]]
                    ).astype(np.int64)
                    feats = _features(flat)
                    for c in cols:
                        acc[c][idx] = feats[c]
                else:
                    for j, r in zip(idx, sub.itertuples(index=False)):
                        px = decode_image(r.bytes, r.w, r.h, r.fmt)
                        feats = _features(px.reshape(1, -1).astype(np.int64))
                        for c in cols:
                            acc[c][j] = feats[c][0]
            out = {"image_id": pdf["image_id"].to_numpy(), "fmt": fmts}
            out.update(acc)
            yield pd.DataFrame(out)

    schema = "image_id string, fmt string, " + ", ".join(
        f"{c} long" for c in cols
    )
    return images.mapInPandas(stats, schema)


def image_moments(images: DataFrame) -> DataFrame:
    """Per-image raw spatial moments of the luma plane from ONE decode
    pass — the shape/centroid leg of the image feature extractor
    (centroid, spread and orientation all derive from these six sums):

      m_pq = Σ_{x,y} x^p · y^q · luma(x, y),  (p+q) ≤ 2

    with ``luma = (299R + 587G + 114B) DIV 1000`` — the same integer
    luma as :func:`phash64_batch` — so every moment is an EXACT int64
    (for 255-luma images up to ~1500×1500 m11 stays < 2⁶³) and a
    DuckDB oracle replays them bit-for-bit from the closed-form pixel
    generator.  The float conveniences (centroid x̄ = m10/m00, central
    moments μ20 = m20 − x̄·m10 …, anisotropy) are fixed-order scalar
    divisions left to the caller — see ``q_image_moments``.

    Plan at scale: one ``mapInPandas`` over Arrow batches (vectorized
    dot products against precomputed coordinate vectors; png decodes
    per row like :func:`decode_stats`); output is ~60 B/row.
    """

    def _features(flat: np.ndarray, w: int, h: int) -> dict:
        """flat: (B, 3wh) int64 interleaved RGB rows."""
        b = flat.shape[0]
        px = flat.reshape(b, h * w, 3)
        luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
        idx = np.arange(h * w, dtype=np.int64)
        x, y = idx % w, idx // w
        return {
            "m00": luma.sum(axis=1),
            "m10": luma @ x,
            "m01": luma @ y,
            "m20": luma @ (x * x),
            "m02": luma @ (y * y),
            "m11": luma @ (x * y),
        }

    cols = ["m00", "m10", "m01", "m20", "m02", "m11"]

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_rows = len(pdf)
            acc = {c: np.zeros(n_rows, dtype=np.int64) for c in cols}
            fmts = pdf["fmt"].to_numpy()
            # vectorized path requires uniform (w, h) within a stack —
            # group on (fmt, w, h) so mixed-size tables stay correct
            # (groupby.indices keeps the grouping linear in batch size)
            for grp, idx in pdf.groupby(["fmt", "w", "h"], sort=False).indices.items():
                sub = pdf.iloc[idx]
                fmt, w, h = grp
                if fmt in ("raw", "qnt4"):
                    flat = np.stack(
                        [np.frombuffer(b, dtype=np.uint8) for b in sub["bytes"]]
                    ).astype(np.int64)
                    feats = _features(flat, int(w), int(h))
                    for c in cols:
                        acc[c][idx] = feats[c]
                else:
                    for j, r in zip(idx, sub.itertuples(index=False)):
                        px = decode_image(r.bytes, r.w, r.h, r.fmt)
                        feats = _features(
                            px.reshape(1, -1).astype(np.int64), int(r.w), int(r.h)
                        )
                        for c in cols:
                            acc[c][j] = feats[c][0]
            out = {"image_id": pdf["image_id"].to_numpy(), "fmt": fmts}
            out.update(acc)
            yield pd.DataFrame(out)

    schema = "image_id string, fmt string, " + ", ".join(
        f"{c} long" for c in cols
    )
    return images.mapInPandas(stats, schema)


def shared_blocks(
    images: DataFrame,
    bw: int = 8,
    bh: int = 8,
    min_images: int = 2,
    drop_constant: bool = True,
) -> DataFrame:
    """Sub-image duplicate-tile detection — which pixel blocks recur
    across DIFFERENT images?  The block-granular dedup primitive that
    catches shared watermarks / logos / letterboxes that whole-image
    hashes (phash) dilute away.

    Each image is cut into ``bw×bh`` pixel blocks (w, h must divide —
    the synthesizer's 32×24 yields 4×3); a block's signature is the
    EXACT integer pair ``(Σp, Σ p·(j+1))`` over its flat RGB bytes in
    block-local row-major order — deterministic in any engine (no
    float, no real hash), and the two weighted sums make accidental
    collisions vanishingly unlikely at 8×8×3 = 192 bytes.  Blocks are
    then grouped BY SIGNATURE: a signature spanning ≥ ``min_images``
    distinct images is a shared tile.

    Plan at scale: one ``mapInPandas`` decode pass emits the tiny
    (image_id, bx, by, sig) table (~40 B per block), then ONE shuffle
    on the signature key.  Real-corpus caveat: degenerate blocks
    (all-black letterbox bars) are hot signature keys — with
    ``drop_constant=True`` (the default) they are pre-filtered INSIDE
    the decode pass, before the shuffle, via the exact integer identity
    ``sig1·2 == sig0·(n+1)`` (an all-``v`` block has ``sig0 = v·n`` and
    ``sig1 = v·n(n+1)/2``); the identity IS the filter semantics, so
    the DuckDB twin applies the same predicate and stays bit-identical.
    A constant bar shared by 10⁹ images would otherwise put 10⁹ rows
    on one reducer key — the same hot-key failure ``skew.salt_hot_cells``
    handles for cells, solved here by removal because a constant block
    carries no dedup signal.

    Output: ``(sig0, sig1, n_blocks, n_imgs)`` — one row per
    (non-constant, when ``drop_constant``) signature shared by
    ≥ ``min_images`` images.
    """
    if bw <= 0 or bh <= 0:
        raise ValueError("bw and bh must be positive")
    if min_images < 1:
        raise ValueError(f"min_images must be ≥ 1, got {min_images}")
    n_loc = bw * bh * 3
    wts = np.arange(1, n_loc + 1, dtype=np.int64)

    def _sigs(flat: np.ndarray, w: int, h: int) -> tuple[np.ndarray, np.ndarray]:
        """flat: (B, 3wh) int64 → (B, nblocks) signature pair."""
        b = flat.shape[0]
        px = flat.reshape(b, h, w, 3)
        nby, nbx = h // bh, w // bw
        # (B, nby, bh, nbx, bw, 3) → (B, nblocks, bh, bw, 3) → flat blocks
        blocks = (
            px.reshape(b, nby, bh, nbx, bw, 3)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, nby * nbx, n_loc)
        )
        return blocks.sum(axis=2), blocks @ wts

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows = {
                "image_id": [], "bx": [], "by": [], "sig0": [], "sig1": [],
            }
            for r in pdf.itertuples(index=False):
                if r.w % bw or r.h % bh:
                    raise ValueError(
                        f"image {r.image_id}: {r.w}×{r.h} not divisible by "
                        f"{bw}×{bh} blocks"
                    )
                px = decode_image(r.bytes, r.w, r.h, r.fmt)
                s0, s1 = _sigs(
                    px.reshape(1, -1).astype(np.int64), int(r.w), int(r.h)
                )
                nbx = r.w // bw
                if drop_constant:
                    # constant block ⟺ sig1·2 == sig0·(n+1); drop BEFORE
                    # the shuffle so hot bar keys never leave the mapper
                    bis = np.nonzero(2 * s1[0] != s0[0] * (n_loc + 1))[0]
                else:
                    bis = np.arange(s0.shape[1])
                for bi in bis:
                    out_rows["image_id"].append(r.image_id)
                    out_rows["bx"].append(int(bi) % nbx)
                    out_rows["by"].append(int(bi) // nbx)
                    out_rows["sig0"].append(int(s0[0, bi]))
                    out_rows["sig1"].append(int(s1[0, bi]))
            yield pd.DataFrame(out_rows)

    sig = images.mapInPandas(
        stats, "image_id string, bx long, by long, sig0 long, sig1 long"
    )
    return (
        sig.groupBy("sig0", "sig1")
        .agg(
            F.count("*").alias("n_blocks"),
            F.countDistinct("image_id").alias("n_imgs"),
        )
        .filter(F.col("n_imgs") >= min_images)
    )


def _hamming_chunk_masks(chunks: int) -> list[int]:
    """Even bit split of the 64-bit hash into ``chunks`` pigeonhole
    masks; the top chunk's mask includes bit 63 → wrap to signed int64
    for F.lit / LongType."""
    starts = [c * 64 // chunks for c in range(chunks)] + [64]
    masks = []
    for c in range(chunks):
        mask = ((1 << (starts[c + 1] - starts[c])) - 1) << starts[c]
        if mask >= 1 << 63:
            mask -= 1 << 64
        masks.append(mask)
    return masks


def phash_near_dups(images: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Near-duplicate images by phash Hamming distance — chunked band join
    (pigeonhole over max_hamming+1 chunks), same shape as SimHash dedup.

    The (image_id, phash) signature is tiny (16 B/row) next to the image
    payloads it derives from, so it is persisted across the self-join's
    two sides: the decode/synthesis subtree runs ONCE, not once per side
    (the cache is dropped when the session-bounded pool rotates, same
    policy as the text-dedup shingle cache)."""
    from gotrackmaster_spark.operators.dedup import band_stack

    masks = _hamming_chunk_masks(max_hamming + 1)
    sig = images.select("image_id", "phash")
    sig = _bound_sig_cache(sig)
    stacked = band_stack(sig, "image_id", "phash", masks)
    a = stacked.select(F.col("image_id").alias("a_id"), F.col("phash").alias("a_ph"), "chunk", "chunk_val")
    b = stacked.select(F.col("image_id").alias("b_id"), F.col("phash").alias("b_ph"), "chunk", "chunk_val")
    cand = (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_ph", "b_ph")
        .distinct()
    )
    ham = F.bit_count(F.col("a_ph").bitwiseXOR(F.col("b_ph"))).cast("int")
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "a_id", "b_id", "hamming"
    )


def orientation_hist(images: DataFrame) -> DataFrame:
    """Per-image gradient-ORIENTATION histogram (HOG-lite) from ONE
    decode pass: at every flat byte position with both neighbors in
    range, the gradient pair ``(gx, gy) = (p[i+3] − p[i], p[i+3w] −
    p[i])`` (the channel-aligned strides of
    :func:`pixel_feature_stats`) is classified into the 8 half-open
    45° octants — by PURE INTEGER COMPARISONS, the
    ``spatial.octant_sector`` rule, never atan2 — plus a ``zero``
    class; per class the count and Σ(gx²+gy²) magnitude are exact
    int64, so a DuckDB oracle replays the histogram bit-for-bit via
    lead strides and the identical (mutually-exclusive) CASE arms.

    Output (wide — one row per image): ``o0..o7`` counts CCW from +x
    (0=E … 7=SE by octant START bearing), ``n_zero``, ``mag2_sum``.
    """

    def _features(flat: np.ndarray, w: int) -> dict:
        b, n = flat.shape
        stride = 3 * w
        m = n - stride  # positions with BOTH neighbors in range (stride ≥ 3)
        if m <= 0:
            z = np.zeros(b, dtype=np.int64)
            return {f"o{k}": z.copy() for k in range(8)} | {
                "n_zero": z.copy(), "mag2_sum": z.copy(),
            }
        p0 = flat[:, :m]
        gx = flat[:, 3:m + 3] - p0
        gy = flat[:, stride:] - p0
        # mutually-exclusive octant conditions (order-free)
        conds = [
            (gx > 0) & (gy >= 0) & (gy < gx),
            (gy > 0) & (gx > 0) & (gx <= gy),
            (gy > 0) & (gx <= 0) & (-gx < gy),
            (gx < 0) & (gy > 0) & (gy <= -gx),
            (gx < 0) & (gy <= 0) & (-gy < -gx),
            (gy < 0) & (gx < 0) & (-gx <= -gy),
            (gy < 0) & (gx >= 0) & (gx < -gy),
            (gx > 0) & (gy < 0) & (-gy <= gx),
        ]
        out = {f"o{k}": c.sum(axis=1).astype(np.int64) for k, c in enumerate(conds)}
        out["n_zero"] = ((gx == 0) & (gy == 0)).sum(axis=1).astype(np.int64)
        out["mag2_sum"] = (gx * gx + gy * gy).sum(axis=1)
        return out

    cols = [f"o{k}" for k in range(8)] + ["n_zero", "mag2_sum"]

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_rows = len(pdf)
            acc = {c: np.zeros(n_rows, dtype=np.int64) for c in cols}
            fmts = pdf["fmt"].to_numpy()
            for grp in np.unique(fmts):
                idx = np.where(fmts == grp)[0]
                sub = pdf.iloc[idx]
                if grp in ("raw", "qnt4"):
                    flat = np.stack(
                        [np.frombuffer(b, dtype=np.uint8) for b in sub["bytes"]]
                    ).astype(np.int64)
                    feats = _features(flat, int(sub["w"].iloc[0]))
                    for c in cols:
                        acc[c][idx] = feats[c]
                else:
                    for j, r in zip(idx, sub.itertuples(index=False)):
                        px = decode_image(r.bytes, r.w, r.h, r.fmt)
                        feats = _features(
                            px.reshape(1, -1).astype(np.int64), int(r.w)
                        )
                        for c in cols:
                            acc[c][j] = feats[c][0]
            out = {"image_id": pdf["image_id"].to_numpy(), "fmt": fmts}
            out.update(acc)
            yield pd.DataFrame(out)

    schema = "image_id string, fmt string, " + ", ".join(
        f"{c} long" for c in cols
    )
    return images.mapInPandas(stats, schema)


_bound_ptk_cache = make_bounded_cache()  # corpus signatures (phash top-k)


def phash_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    max_hamming: int = 16,
) -> DataFrame:
    """Per-query top-k visually-similar images by phash Hamming distance
    — the image twin of ``dedup.embedding_topk``: rank the corpus for
    each query, WITHIN ``max_hamming`` (the bounded-search contract:
    pigeonhole banding guarantees every corpus image at distance ≤
    max_hamming is a candidate; anything farther is out of scope by
    design, so a query with no near neighbor returns < k rows, never a
    wrong one).

    ``corpus`` / ``queries``: ``(image_id, phash)`` rows (queries
    usually a bounded subset — the ``embedding_topk`` bounded-Q
    contract).  Candidates come from the chunk equi-join between the
    banded query subset and the banded corpus (never |Q|·|C|); the
    Hamming verify and the (hamming, image_id) ranking are exact-int
    and fully deterministic.

    Output: ``(q_id, b_id, hamming, rnk)`` — up to k rows per query,
    rnk 1-based by (hamming asc, b_id asc), self-matches excluded.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    from gotrackmaster_spark.operators.dedup import band_stack

    masks = _hamming_chunk_masks(max_hamming + 1)
    sig = _bound_ptk_cache(corpus.select("image_id", "phash"))
    b = band_stack(sig, "image_id", "phash", masks).select(
        F.col("image_id").alias("b_id"), F.col("phash").alias("b_ph"),
        "chunk", "chunk_val",
    )
    q = band_stack(
        queries.select("image_id", "phash"), "image_id", "phash", masks
    ).select(
        F.col("image_id").alias("q_id"), F.col("phash").alias("q_ph"),
        "chunk", "chunk_val",
    )
    cand = (
        q.join(b, ["chunk", "chunk_val"])
        .filter(F.col("q_id") != F.col("b_id"))
        .select("q_id", "b_id", "q_ph", "b_ph")
        .distinct()
    )
    ham = F.bit_count(F.col("q_ph").bitwiseXOR(F.col("b_ph"))).cast("int")
    w = Window.partitionBy("q_id").orderBy("hamming", "b_id")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "b_id", "hamming", "rnk")
    )


def geo_phash_near_dups(
    sig: DataFrame,
    max_hamming: int = 10,
    id_col: str = "image_id",
    phash_col: str = "phash",
    cell_col: str = "cell",
) -> DataFrame:
    """Geo-constrained visual near-dup pairs: images in the SAME spatial
    cell whose phash Hamming distance is <= ``max_hamming`` — the
    "same place, near-identical photo" dedup of a geotagged image corpus.

    At web scale the geotag is a far stronger candidate cutter than
    phash banding: candidates come from ONE equi-join on the cell id
    (per-cell pair count is bounded by local photo density; a hot
    landmark cell is exactly the AQE skew-split case), and the Hamming
    verify is pure codegen (`bit_count(xor)`), so no O(n²) path and no
    Python in the pipeline.  Semantics contract: pairs straddling a
    cell boundary are NOT candidates — pick the cell resolution to
    match the "same place" radius (callers wanting overlap-free recall
    use a k-ring explode on one side, as in `operators/spatial.knn`).

    ``sig``: (id_col, phash_col int64, cell_col) — one row per image;
    tiny (24 B/row) next to the payloads it derives from, so it is
    persisted across the self-join's two sides (decode runs once).
    """
    s = _bound_sig_cache(sig.select(id_col, phash_col, cell_col))
    a = s.select(
        F.col(id_col).alias("a_id"),
        F.col(phash_col).alias("a_ph"),
        F.col(cell_col).alias("cell"),
    )
    b = s.select(
        F.col(id_col).alias("b_id"),
        F.col(phash_col).alias("b_ph"),
        F.col(cell_col).alias("cell"),
    )
    ham = F.bit_count(F.col("a_ph").bitwiseXOR(F.col("b_ph"))).cast("int")
    return (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming", "cell")
    )


def render_density_rasters(
    pts: DataFrame,
    px: int = 16,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Geo→image crossover: render per-1°-tile point-density heatmaps as
    REAL image payloads (px×px RGB, value = min(255, count) in every
    channel, encoded through the real PNG codec) — the "produce map
    tiles from a spatial aggregate" path of a tile server, with the
    payload flowing back into the standard decode machinery.

    Plan: ONE groupBy shuffle on (tile, sub-pixel) for the counts (the
    points are never collected), then an `applyInPandas` per tile over
    the ≤ px² aggregated count rows — the Python stage touches O(tiles ·
    px²) rows, independent of point count.  Output schema matches the
    `decode_stats` input contract (image_id/bytes/w/h/fmt/caption), so
    rendered tiles are first-class image rows.
    """
    ty = F.floor(F.col(lat_col)).cast("long")
    tx = F.floor(F.col(lon_col)).cast("long")
    # Clamp to px-1: a coordinate 1 ulp below an integer has
    # (coord - floor(coord)) round to exactly 1.0 in double, which would
    # index row px and crash the render.
    sy = F.least(F.floor((F.col(lat_col) - ty) * px), F.lit(px - 1)).cast("int")
    sx = F.least(F.floor((F.col(lon_col) - tx) * px), F.lit(px - 1)).cast("int")
    counts = (
        pts.select(ty.alias("ty"), tx.alias("tx"), sy.alias("sy"), sx.alias("sx"))
        .groupBy("ty", "tx", "sy", "sx")
        .agg(F.count("*").alias("cnt"))
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        t_y, t_x = int(pdf["ty"].iloc[0]), int(pdf["tx"].iloc[0])
        arr = np.zeros((px, px, 3), dtype=np.uint8)
        v = np.minimum(pdf["cnt"].to_numpy(), 255).astype(np.uint8)
        arr[pdf["sy"].to_numpy(), pdf["sx"].to_numpy(), :] = v[:, None]
        tile = f"t{t_y}_{t_x}"
        return pd.DataFrame(
            {
                "image_id": [tile],
                "bytes": [encode_image(arr, "png")],
                "w": [px],
                "h": [px],
                "fmt": ["png"],
                "caption": [tile],
            }
        )

    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string"
    return counts.groupBy("ty", "tx").applyInPandas(
        lambda key, pdf: render(pdf), schema
    )


# ----------------------------------------------------------- pairwise SSIM ---

SSIM_C1 = 6.5025   # (0.01 * 255)^2 — the standard SSIM stabilizers
SSIM_C2 = 58.5225  # (0.03 * 255)^2


def pairwise_ssim(pairs: DataFrame) -> DataFrame:
    """Global structural similarity between two image payloads per row —
    the perceptual-similarity verifier that sits behind a phash candidate
    cut (phash says "maybe the same picture"; SSIM grades HOW similar the
    decoded pixels actually are).

    ``pairs`` carries ``(pair_id, bytes_a, bytes_b, w, h, fmt_a, fmt_b)``
    with both payloads the same (w, h).  ONE ``mapInPandas`` pass decodes
    both sides and emits the five EXACT int64 moments over the flat RGB
    arrays (n = w·h·3)::

        sx = Σx   sy = Σy   sxx = Σx²   syy = Σy²   sxy = Σx·y

    The float algebra — global (single-window) SSIM with population
    variances,

        SSIM = (2·μx·μy + C1)(2·cov + C2)
               ───────────────────────────────,   cov = sxy/n − μx·μy
               (μx² + μy² + C1)(σx² + σy² + C2)

    — runs in Catalyst Column expressions in a FIXED order (only
    +,−,×,÷ on doubles: IEEE-identical in any engine), so a DuckDB twin
    that replays the integer moments from the closed-form generator
    reproduces the double bit-for-bit — no rounding needed.

    Plan at scale: whatever produced the pairing (usually a phash
    chunk-join) fixes the shuffle topology; this stage is row-local —
    one Arrow decode pass, zero additional exchanges.
    """

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            sx = np.zeros(n, dtype=np.int64)
            sy = np.zeros(n, dtype=np.int64)
            sxx = np.zeros(n, dtype=np.int64)
            syy = np.zeros(n, dtype=np.int64)
            sxy = np.zeros(n, dtype=np.int64)
            for j, r in enumerate(pdf.itertuples(index=False)):
                a = decode_image(bytes(r.bytes_a), int(r.w), int(r.h), r.fmt_a)
                b = decode_image(bytes(r.bytes_b), int(r.w), int(r.h), r.fmt_b)
                x = a.reshape(-1).astype(np.int64)
                y = b.reshape(-1).astype(np.int64)
                sx[j] = int(x.sum())
                sy[j] = int(y.sum())
                sxx[j] = int((x * x).sum())
                syy[j] = int((y * y).sum())
                sxy[j] = int((x * y).sum())
            yield pd.DataFrame(
                {
                    "pair_id": pdf["pair_id"].to_numpy(),
                    "n_pix": (
                        pdf["w"].to_numpy().astype(np.int64)
                        * pdf["h"].to_numpy().astype(np.int64)
                        * 3
                    ),
                    "sx": sx,
                    "sy": sy,
                    "sxx": sxx,
                    "syy": syy,
                    "sxy": sxy,
                }
            )

    m = pairs.mapInPandas(
        moments,
        "pair_id string, n_pix long, sx long, sy long, sxx long, syy long, sxy long",
    )
    return m.select("pair_id", "n_pix", "sxy", ssim_col().alias("ssim"))


def ssim_col() -> "F.Column":
    """The fixed-order SSIM float algebra over the exact integer moment
    columns (n_pix, sx, sy, sxx, syy, sxy) — shared between the operator
    and tests; the DuckDB twin spells the same parenthesization."""
    n = F.col("n_pix").cast("double")
    mx = F.col("sx") / n
    my = F.col("sy") / n
    vx = F.col("sxx") / n - mx * mx
    vy = F.col("syy") / n - my * my
    cov = F.col("sxy") / n - mx * my
    num = (F.lit(2.0) * mx * my + F.lit(SSIM_C1)) * (F.lit(2.0) * cov + F.lit(SSIM_C2))
    den = (mx * mx + my * my + F.lit(SSIM_C1)) * (vx + vy + F.lit(SSIM_C2))
    return num / den


def colorfulness_stats(images: DataFrame) -> DataFrame:
    """Per-image Hasler–Süsstrunk colorfulness moments from ONE decode
    pass — the "is this a vivid photo or a gray scan?" corpus-QC signal
    of the image pipeline.

    The metric is C = sqrt(σ²_rg + σ²_yb) + 0.3·sqrt(µ²_rg + µ²_yb)
    over the opponent channels rg = R − G and yb = (R+G)/2 − B.  To
    stay engine-exact, this operator emits only EXACT int64 sums —
    Σrg, Σrg², and (to avoid the /2) Σyb2, Σyb2² with yb2 = R + G − 2B
    — plus n_px; the float algebra reduces to

      C = ( sqrt(4·V_rg + V_yb2) + 0.3·sqrt(4·(Σrg)² + (Σyb2)²) ) / (2n)

    with V_x = n·Σx² − (Σx)² (exact ints ≥ 0), i.e. two correctly-
    rounded IEEE sqrts on exact integers and one fixed-order divide —
    bit-identical in any engine (see ``q_image_colorfulness``).

    Plan at scale: one ``mapInPandas`` Arrow pass (vectorized opponent
    sums, per-row png decode like :func:`image_moments`), ~50 B/row out.
    int64 bound: |rg| ≤ 255 so n·Σrg² ≤ n²·255² — safe below ~10⁷ px.
    """
    cols = ["n_px", "sum_rg", "sum_rg2", "sum_yb2", "sum_yb2sq"]

    def _features(flat: np.ndarray) -> dict:
        b = flat.shape[0]
        px = flat.reshape(b, -1, 3)
        rg = px[..., 0] - px[..., 1]
        yb2 = px[..., 0] + px[..., 1] - 2 * px[..., 2]
        return {
            "n_px": np.full(b, px.shape[1], dtype=np.int64),
            "sum_rg": rg.sum(axis=1),
            "sum_rg2": (rg * rg).sum(axis=1),
            "sum_yb2": yb2.sum(axis=1),
            "sum_yb2sq": (yb2 * yb2).sum(axis=1),
        }

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_rows = len(pdf)
            acc = {c: np.zeros(n_rows, dtype=np.int64) for c in cols}
            fmts = pdf["fmt"].to_numpy()
            for grp, idx in pdf.groupby(["fmt", "w", "h"], sort=False).indices.items():
                sub = pdf.iloc[idx]
                fmt, w, h = grp
                if fmt in ("raw", "qnt4"):
                    flat = np.stack(
                        [np.frombuffer(b, dtype=np.uint8) for b in sub["bytes"]]
                    ).astype(np.int64)
                    feats = _features(flat)
                    for c in cols:
                        acc[c][idx] = feats[c]
                else:
                    for j, r in zip(idx, sub.itertuples(index=False)):
                        px = decode_image(r.bytes, r.w, r.h, r.fmt)
                        feats = _features(px.reshape(1, -1).astype(np.int64))
                        for c in cols:
                            acc[c][j] = feats[c][0]
            out = {"image_id": pdf["image_id"].to_numpy(), "fmt": fmts}
            out.update(acc)
            yield pd.DataFrame(out)

    schema = "image_id string, fmt string, " + ", ".join(f"{c} long" for c in cols)
    return images.mapInPandas(stats, schema)


def luma_histogram(images: DataFrame) -> DataFrame:
    """Per-image 256-bin histogram of the integer luma plane from ONE
    decode pass — ``(image_id, fmt, l, n)`` with only OCCUPIED bins
    emitted (≤ 256 rows / ~25 B each per image, independent of pixel
    count): the bounded intermediate every histogram-shaped image
    statistic (Otsu thresholding, equalization, contrast stretch)
    shares.  Luma is the same exact integer ``(299R+587G+114B) DIV
    1000`` as :func:`phash64_batch` / :func:`image_moments`, so a
    DuckDB oracle replays the bins bit-for-bit from the closed-form
    pixel generator.

    Plan at scale: one ``mapInPandas`` over Arrow batches — raw/qnt4
    stacks decode vectorized per (fmt, w, h) group with ONE offset
    ``bincount`` per stack; png falls back to per-row decode like
    :func:`image_moments`.  Downstream threshold scans stay entirely
    JVM-side on the ≤256-row-per-image output.
    """

    def _bins(luma: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """luma: (B, wh) int64 → (row_idx, l, n) of occupied bins."""
        b = luma.shape[0]
        off = luma + 256 * np.arange(b, dtype=np.int64)[:, None]
        counts = np.bincount(off.ravel(), minlength=256 * b)
        occ = np.nonzero(counts)[0]
        return occ // 256, occ % 256, counts[occ]

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows_id, rows_fmt, rows_l, rows_n = [], [], [], []
            for grp, idx in pdf.groupby(["fmt", "w", "h"], sort=False).indices.items():
                sub = pdf.iloc[idx]
                fmt, w, h = grp
                if fmt in ("raw", "qnt4"):
                    px = np.stack(
                        [np.frombuffer(b, dtype=np.uint8) for b in sub["bytes"]]
                    ).astype(np.int64).reshape(len(idx), -1, 3)
                else:
                    px = np.stack(
                        [decode_image(r.bytes, r.w, r.h, r.fmt).reshape(-1, 3)
                         for r in sub.itertuples(index=False)]
                    ).astype(np.int64)
                luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
                ri, ls, ns = _bins(luma)
                ids = sub["image_id"].to_numpy()
                rows_id.append(ids[ri])
                rows_fmt.append(np.full(len(ri), fmt))
                rows_l.append(ls)
                rows_n.append(ns)
            yield pd.DataFrame({
                "image_id": np.concatenate(rows_id),
                "fmt": np.concatenate(rows_fmt),
                "l": np.concatenate(rows_l).astype(np.int64),
                "n": np.concatenate(rows_n).astype(np.int64),
            })

    return images.mapInPandas(hist, "image_id string, fmt string, l long, n long")


def euler_stats(images: DataFrame, thresh: int = 128) -> DataFrame:
    """Per-image Euler characteristic of the binarized luma plane —
    the classic topological quality feature (Gray 1971; used for blob/
    hole counting in OCR and defect screens):

      E₄ = V − E + Q  =  #4-connected components − #8-connected holes

    where over the foreground mask (luma ≥ ``thresh``): V = foreground
    pixels, E = horizontally + vertically adjacent foreground pairs,
    Q = 2×2 all-foreground quads.  Every term is an exact integer from
    ONE decode pass (numpy shift products — no labeling, no recursion),
    so a DuckDB oracle replays all four from the closed-form pixel
    generator at shifted flat indices.

    Output: ``(image_id, fmt, n_fg, n_adj, n_quad, euler)``.
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fmts = pdf["image_id"].to_numpy(), pdf["fmt"].to_numpy()
            n_fg = np.zeros(len(pdf), dtype=np.int64)
            n_adj = np.zeros(len(pdf), dtype=np.int64)
            n_quad = np.zeros(len(pdf), dtype=np.int64)
            for i, r in enumerate(pdf.itertuples(index=False)):
                px = decode_image(r.bytes, r.w, r.h, r.fmt).astype(np.int64)
                luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
                fg = (luma >= thresh).astype(np.int64)
                n_fg[i] = fg.sum()
                n_adj[i] = (fg[:, :-1] * fg[:, 1:]).sum() + (fg[:-1, :] * fg[1:, :]).sum()
                n_quad[i] = (
                    fg[:-1, :-1] * fg[:-1, 1:] * fg[1:, :-1] * fg[1:, 1:]
                ).sum()
            yield pd.DataFrame({
                "image_id": ids, "fmt": fmts,
                "n_fg": n_fg, "n_adj": n_adj, "n_quad": n_quad,
                "euler": n_fg - n_adj + n_quad,
            })

    schema = ("image_id string, fmt string, n_fg long, n_adj long, "
              "n_quad long, euler long")
    return images.mapInPandas(stats, schema)


def luma_plane(images: DataFrame) -> DataFrame:
    """Decode → the per-pixel luma plane as a RELATION: ``(image_id,
    fmt, x, y, l)`` — the raster↔relational bridge.  Downstream raster
    math (wavelet transforms, filters, per-row statistics) then runs
    entirely JVM-side as joins/aggregates instead of growing one more
    bespoke kernel per statistic.  Same exact integer luma as
    :func:`phash64_batch`; one ``mapInPandas`` decode pass, output
    ~20 B/pixel (bounded: pixels, not bytes×channels).
    """

    def plane(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = []
            for r in pdf.itertuples(index=False):
                px = decode_image(r.bytes, r.w, r.h, r.fmt).astype(np.int64)
                luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
                h, w = luma.shape
                idx = np.arange(h * w, dtype=np.int64)
                outs.append(pd.DataFrame({
                    "image_id": np.full(h * w, r.image_id),
                    "fmt": np.full(h * w, r.fmt),
                    "x": (idx % w).astype(np.int32),
                    "y": (idx // w).astype(np.int32),
                    "l": luma.ravel(),
                }))
            yield pd.concat(outs, ignore_index=True)

    return images.mapInPandas(
        plane, "image_id string, fmt string, x int, y int, l long"
    )
