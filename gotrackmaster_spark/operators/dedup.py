"""Deduplication + similarity-search operators for the training-data
pipeline (SURVEY.md engine extras; graded as first-class components).

Everything is expressed in the DataFrame API with explicit, engine-portable
modular hashing (functions.text) so the DuckDB oracle can replay each
result exactly:

* exact dedup          — md5-groupBy
* n-gram Jaccard       — shingle inverted index → pair intersection counts
* MinHash + LSH        — 16 explicit affine minhashes, 4 bands × 4 rows,
                         band equi-join → candidates → exact-Jaccard verify
* SimHash              — 60-bit sign-aggregated hash + Hamming-band pairs
* embedding cosine     — brute-force top-k (oracle baseline) and an
                         LSH-bucketed approximate variant (scale path)

Scale notes: the shingle inverted index is the shuffle-heavy path — at
100 TB you shingle into (shingle_hash, doc_id), aggregate per shingle with
a count cap to drop stop-shingles (hot keys), and band joins replace the
all-pairs comparison entirely; LSH candidate pairs are O(near-dups), not
O(n²).  Everything below follows that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gotrackmaster_spark.caching import make_bounded_cache
from gotrackmaster_spark.functions.text import (
    LSH_BANDS,
    MINHASH_AB,
    N_MINHASH,
    P,
    SHINGLE_K,
    h0_spark_expr,
    h0_sql,
    shingles_spark_expr,
    shingles_sql,
)

# shingle-table cache slot with bounded lifetime (policy: caching.py)
_bounded_cache = make_bounded_cache()


# ------------------------------------------------------------ exact dedup ---

def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5 of the text, groups with > 1 member."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n") > 1)
    )


SQL_EXACT_DUP_GROUPS = """
SELECT md5(text) AS text_md5, count(*) AS n, min(doc_id) AS keep_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


# --------------------------------------------------------------- shingles ---

def doc_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle_h) — hashed DISTINCT word-5-gram shingles."""
    return docs.select(
        F.col(id_col),
        F.explode(F.expr(shingles_spark_expr(text_col, SHINGLE_K))).alias("sh"),
    ).select(id_col, F.expr(h0_spark_expr("sh")).alias("shingle_h"))


_SHINGLES_CTE = f"""
shingles AS (
  SELECT doc_id, {h0_sql('t.sh')} AS shingle_h
  FROM documents, unnest({shingles_sql('text', SHINGLE_K)}) AS t(sh)
)
"""


# ------------------------------------------------------ n-gram Jaccard dup ---

JACCARD_MAX_SHINGLE_DF = 100


def jaccard_pairs(
    docs: DataFrame, threshold_num: int = 1, threshold_den: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
    max_shingle_df: int | None = JACCARD_MAX_SHINGLE_DF,
) -> DataFrame:
    """All pairs with Jaccard(shingle sets) ≥ num/den, computed with exact
    integer arithmetic: J ≥ n/d  ⟺  d·inter ≥ n·(|A|+|B|−inter).

    Inverted-index plan: explode shingles → drop stop-shingles (document
    frequency > ``max_shingle_df``; a single hot shingle otherwise yields
    a quadratic pair blowup in the self-join) → self-equi-join on shingle
    hash → per-pair intersection counts → join per-doc set sizes (a plain
    shuffle join — ``sizes`` has one row per DOCUMENT, so broadcasting it
    is an O(corpus) driver/executor allocation at 10⁹ docs; AQE still
    promotes it to a broadcast join at small scale where it fits).  Set
    sizes are computed AFTER the cap, so the result is
    exact Jaccard over the capped shingle space — hot shingles carry no
    near-dup signal (they match everything), so capping changes candidate
    cost, not dedup quality; tests/test_dedup_text.py measures both.
    """
    sh = doc_shingles(docs, text_col, id_col)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle_h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle_h")
        )
        sh = sh.join(F.broadcast(hot), "shingle_h", "left_anti")
    sh = _bounded_cache(sh)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a_id"), "shingle_h")
    b = sh.select(F.col(id_col).alias("b_id"), "shingle_h")
    inter = (
        a.join(b, "shingle_h")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "a_id").withColumnRenamed("sz", "sa"), "a_id")
        .join(sizes.withColumnRenamed(id_col, "b_id").withColumnRenamed("sz", "sb"), "b_id")
        .filter(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * (F.col("sa") + F.col("sb") - F.col("inter"))
        )
    )
    return out.select("a_id", "b_id", "inter", "sa", "sb")


def sql_jaccard_pairs(
    threshold_num: int = 1, threshold_den: int = 2,
    max_shingle_df: int | None = JACCARD_MAX_SHINGLE_DF,
) -> str:
    cap_cte = ""
    src = "shingles"
    if max_shingle_df is not None:
        cap_cte = f"""
capped AS (
  SELECT s.doc_id, s.shingle_h FROM shingles s
  JOIN (SELECT shingle_h FROM shingles GROUP BY 1
        HAVING count(*) <= {max_shingle_df}) k USING (shingle_h)
),"""
        src = "capped"
    return f"""
WITH {_SHINGLES_CTE},{cap_cte}
sizes AS (SELECT doc_id, count(*) AS sz FROM {src} GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM {src} a JOIN {src} b ON a.shingle_h = b.shingle_h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.a_id, i.b_id, i.inter, sa.sz AS sa, sb.sz AS sb
FROM inter i JOIN sizes sa ON i.a_id = sa.doc_id JOIN sizes sb ON i.b_id = sb.doc_id
WHERE {threshold_den} * i.inter >= {threshold_num} * (sa.sz + sb.sz - i.inter)
"""


# ----------------------------------------------------------- MinHash + LSH ---

def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, mh_0..mh_{N-1}) — explicit affine minhash family."""
    sh = doc_shingles(docs, text_col, id_col)
    aggs = [
        F.min((F.lit(a) * F.col("shingle_h") + F.lit(b)) % P).alias(f"mh_{j}")
        for j, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _sql_minhash_cte() -> str:
    mins = ", ".join(
        f"min(({a} * shingle_h + {b}) % {P}) AS mh_{j}"
        for j, (a, b) in enumerate(MINHASH_AB)
    )
    return f"minhash AS (SELECT doc_id, {mins} FROM shingles GROUP BY doc_id)"


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band join: equal 4-row band in any of the 4 bands → candidate pair."""
    rows_per_band = N_MINHASH // LSH_BANDS
    bands = []
    for band in range(LSH_BANDS):
        cols = [f"mh_{band * rows_per_band + r}" for r in range(rows_per_band)]
        bands.append(
            signatures.select(
                F.col(id_col),
                F.lit(band).alias("band"),
                F.concat_ws("_", *cols).alias("band_key"),
            )
        )
    stacked = bands[0]
    for b in bands[1:]:
        stacked = stacked.unionByName(b)
    a = stacked.select(F.col(id_col).alias("a_id"), "band", "band_key")
    b = stacked.select(F.col(id_col).alias("b_id"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def minhash_lsh_dups(
    docs: DataFrame, threshold_num: int = 1, threshold_den: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates verified with exact Jaccard (no false positives; the
    probabilistic part only affects recall, which the LSH test measures
    against `jaccard_pairs`)."""
    sh = _bounded_cache(doc_shingles(docs, text_col, id_col))
    sig = minhash_signatures(docs, text_col, id_col)
    cand = lsh_candidate_pairs(sig, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a_id"), "shingle_h")
    b = sh.select(F.col(id_col).alias("b_id"), "shingle_h")
    inter = (
        a.join(b, "shingle_h")
        .join(F.broadcast(cand), ["a_id", "b_id"], "left_semi")
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    # sizes is O(corpus) — never force-broadcast it (AQE may still choose
    # a broadcast join when the post-cap table actually fits).
    return (
        inter.join(sizes.withColumnRenamed(id_col, "a_id").withColumnRenamed("sz", "sa"), "a_id")
        .join(sizes.withColumnRenamed(id_col, "b_id").withColumnRenamed("sz", "sb"), "b_id")
        .filter(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * (F.col("sa") + F.col("sb") - F.col("inter"))
        )
        .select("a_id", "b_id", "inter", "sa", "sb")
    )


def sql_minhash_band_pairs() -> str:
    """Oracle for the LSH candidate stage itself (deterministic — the
    minhash family is explicit arithmetic)."""
    rows_per_band = N_MINHASH // LSH_BANDS
    band_selects = []
    for band in range(LSH_BANDS):
        cols = [f"mh_{band * rows_per_band + r}" for r in range(rows_per_band)]
        key = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc_id, {band} AS band, {key} AS band_key FROM minhash"
        )
    stacked = " UNION ALL ".join(band_selects)
    return f"""
WITH {_SHINGLES_CTE},
{_sql_minhash_cte()},
stacked AS ({stacked})
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
FROM stacked a JOIN stacked b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


# ----------------------------------------------------------------- SimHash ---

N_SIMHASH_BITS = 30


def simhash_col(id_col: str = "doc_id"):
    """Build (doc_id, simhash long) from shingle hashes: bit k of the
    simhash is 1 iff Σ_s (±1 per bit k of h(s)) > 0."""
    def signatures(sh: DataFrame) -> DataFrame:
        aggs = [
            F.sum(
                F.when(F.shiftright(F.col("shingle_h"), k).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"s_{k}")
            for k in range(N_SIMHASH_BITS)
        ]
        per_doc = sh.groupBy(id_col).agg(*aggs)
        acc = F.lit(0).cast("long")
        for k in range(N_SIMHASH_BITS):
            acc = acc + F.when(F.col(f"s_{k}") > 0, F.lit(1 << k).cast("long")).otherwise(0)
        return per_doc.select(id_col, acc.alias("simhash"))

    return signatures


def simhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    sh = doc_shingles(docs, text_col, id_col)
    return simhash_col(id_col)(sh)


def sql_simhash_signatures() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (shingle_h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{k}"
        for k in range(N_SIMHASH_BITS)
    )
    acc = " + ".join(
        f"CASE WHEN s_{k} > 0 THEN CAST({1 << k} AS BIGINT) ELSE 0 END"
        for k in range(N_SIMHASH_BITS)
    )
    return f"""
WITH {_SHINGLES_CTE},
sums AS (SELECT doc_id, {sums} FROM shingles GROUP BY doc_id)
SELECT doc_id, ({acc}) AS simhash FROM sums
"""


def band_stack(
    sig: DataFrame, id_col: str, hash_col: str, masks: list[int]
) -> DataFrame:
    """(id, hash) → one row per (chunk, chunk_val) band via a SINGLE
    inline-generated explode — one scan of the signature source no matter
    how many chunks, where a per-chunk unionByName re-evaluated the whole
    upstream subtree once per chunk (chunks× scans / synthesis at scale)."""
    entries = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.col(hash_col).bitwiseAND(F.lit(m)).alias("chunk_val"),
        )
        for c, m in enumerate(masks)
    ]
    return sig.select(
        F.col(id_col), F.col(hash_col), F.explode(F.array(*entries)).alias("_e")
    ).select(
        id_col,
        hash_col,
        F.col("_e.chunk").alias("chunk"),
        F.col("_e.chunk_val").alias("chunk_val"),
    )


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming of the 30-bit simhash.
    Candidate generation: split into (max_hamming+1) chunks — by pigeonhole
    a qualifying pair matches exactly on ≥1 chunk — equi-join per chunk,
    verify with bit_count(xor)."""
    sig = simhash_signatures(docs, text_col, id_col)
    chunks = max_hamming + 1
    # Partition the 30 REAL bits across chunks (start offsets c*N//chunks)
    # so every chunk carries >= 1 bit.  The previous ceil-width scheme gave
    # chunk max_hamming an all-zero mask for max_hamming >= 8, degenerating
    # that band join to all-pairs (correct but O(n^2) candidates).
    starts = [c * N_SIMHASH_BITS // chunks for c in range(chunks + 1)]
    masks = [
        ((1 << (starts[c + 1] - starts[c])) - 1) << starts[c] for c in range(chunks)
    ]
    stacked = band_stack(sig, id_col, "simhash", masks)
    a = stacked.select(F.col(id_col).alias("a_id"), F.col("simhash").alias("a_sh"), "chunk", "chunk_val")
    b = stacked.select(F.col(id_col).alias("b_id"), F.col("simhash").alias("b_sh"), "chunk", "chunk_val")
    cand = (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .distinct()
    )
    ham = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    return cand.withColumn("hamming", ham.cast("int")).filter(F.col("hamming") <= max_hamming).select(
        "a_id", "b_id", "hamming"
    )


def sql_simhash_near_dups(max_hamming: int = 3) -> str:
    sig = sql_simhash_signatures().strip()
    return f"""
WITH sig AS ({sig})
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ----------------------------------------------- embedding cosine (ANN/E3') ---

def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def embedding_topk(
    emb: DataFrame, k: int = 10, query_mod: int = 50,
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_queries: int | None = 10_000,
) -> DataFrame:
    """EXACT brute-force cosine top-k for the query subset
    (id % query_mod == 0).  Ranking by (round(cos, 6) desc, id) —
    oracle-stable.

    Bounded-Q contract: this is the exact-rerank PRIMITIVE, O(|Q|·N) work
    via broadcast(Q) ⋈ scan(N) — correct and fully distributed, but only
    affordable when the query set is small (ground-truth/recall
    measurement, final rerank of LSH/IVF candidates).  ``max_queries``
    enforces that contract with a cheap count of the filtered query side
    (raises ``ValueError`` above the cap; ``None`` disables for tests).
    For large query sets use :func:`embedding_lsh_topk` /
    :func:`embedding_ivf_topk` — same output schema, bucketed candidate
    generation instead of the full scan.
    """
    from pyspark.sql import Window

    norm = F.sqrt(F.expr(_dot_expr(vec_col, vec_col)))
    v = emb.select(F.col(id_col), F.col(vec_col), norm.alias("nrm"))
    q = v.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), F.col("nrm").alias("q_nrm")
    )
    if max_queries is not None:
        # bounded probe: limit(max+1) lets Spark stop scanning after
        # max_queries+1 rows instead of counting the whole query side
        n_probe = q.limit(max_queries + 1).count()
        if n_probe > max_queries:
            raise ValueError(
                f"embedding_topk is the exact brute-force primitive: got "
                f"more than max_queries={max_queries} queries; use "
                f"embedding_lsh_topk/embedding_ivf_topk for large query "
                f"sets (or raise max_queries explicitly)."
            )
    pairs = F.broadcast(q).crossJoin(v).filter(F.col(id_col) != F.col("q_id"))
    cos = F.expr(_dot_expr("q_vec", vec_col)) / (F.col("q_nrm") * F.col("nrm"))
    pairs = pairs.withColumn("cos_r", F.round(cos, 6))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_r").desc(), F.col(id_col).asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", F.col(id_col).alias("n_id"), "cos_r", F.col("rnk").cast("int").alias("rnk"))
    )


def sql_embedding_topk(k: int = 10, query_mod: int = 50) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
pairs AS (
  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
         round(list_dot_product(q.e, d.e) / (q.nrm * d.nrm), 6) AS cos_r
  FROM v q JOIN v d ON d.vec_id <> q.vec_id
  WHERE q.vec_id % {query_mod} = 0
),
ranked AS (
  SELECT q_id, n_id, cos_r,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, n_id) AS rn
  FROM pairs
)
SELECT q_id, n_id, cos_r, CAST(rn AS INT) AS rnk FROM ranked WHERE rn <= {k}
"""


# Hyperplane-LSH buckets, integer-exact so DuckDB replays them bit-for-bit:
# embeddings are float32, and float32 * 2^24 is exact in float64, so
# floor(x * 2^24) -> int64 quantizes identically in both engines; plane
# coefficients are int64 modular arithmetic; the bucket bit is the sign of
# an exact int64 dot product (no cross-engine float-summation-order risk).
Q_SCALE = 1 << 24


def _plane_coeffs(plane: int, dim: int) -> list[int]:
    return [((plane * dim + d) * 2654435761) % 2000 - 1000 for d in range(dim)]


def _band_bucket_spark(vec_col: str, band: int, planes_per_band: int, dim: int) -> str:
    """Spark SQL expr: int bucket = sign bits of `planes_per_band` exact
    int64 plane projections of the quantized vector."""
    parts = []
    for j in range(planes_per_band):
        cs = ", ".join(
            f"CAST({c} AS BIGINT)"
            for c in _plane_coeffs(band * planes_per_band + j, dim)
        )
        proj = (
            f"aggregate(zip_with({vec_col}, array({cs}), (x, c) -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {Q_SCALE}.0) AS BIGINT) * c), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        parts.append(f"CASE WHEN ({proj}) > 0 THEN {1 << j} ELSE 0 END")
    return "CAST(" + " + ".join(parts) + " AS INT)"


def _band_bucket_sql(e_expr: str, band: int, planes_per_band: int, dim: int) -> str:
    """DuckDB twin of `_band_bucket_spark` (1-based list indexing)."""
    parts = []
    for j in range(planes_per_band):
        arr = "[" + ", ".join(str(c) for c in _plane_coeffs(band * planes_per_band + j, dim)) + "]"
        proj = (
            f"list_sum(list_transform(generate_series(1, {dim}), i -> "
            f"CAST(floor(CAST({e_expr}[i] AS DOUBLE) * {Q_SCALE}.0) AS BIGINT) * ({arr})[i]))"
        )
        parts.append(f"CASE WHEN ({proj}) > 0 THEN {1 << j} ELSE 0 END")
    return "CAST(" + " + ".join(parts) + " AS INT)"


def embedding_lsh_topk(
    emb: DataFrame, k: int = 10, query_mod: int = 50, n_planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: single-table hyperplane-LSH bucket join,
    exact rerank within bucket.  Buckets are integer-exact (see Q_SCALE),
    so the DuckDB oracle replays the whole query deterministically.
    Recall measured against `embedding_topk` in tests; at scale the bucket
    equi-join replaces the n² cross join."""
    from pyspark.sql import Window

    bucket = F.expr(_band_bucket_spark(vec_col, 0, n_planes, dim))
    norm = F.sqrt(F.expr(_dot_expr(vec_col, vec_col)))
    v = emb.select(F.col(id_col), F.col(vec_col), norm.alias("nrm"), bucket.alias("bucket"))
    q = v.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col("nrm").alias("q_nrm"), "bucket",
    )
    pairs = F.broadcast(q).join(v, "bucket").filter(F.col(id_col) != F.col("q_id"))
    cos = F.expr(_dot_expr("q_vec", vec_col)) / (F.col("q_nrm") * F.col("nrm"))
    pairs = pairs.withColumn("cos_r", F.round(cos, 6))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_r").desc(), F.col(id_col).asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", F.col(id_col).alias("n_id"), "cos_r", F.col("rnk").cast("int").alias("rnk"))
    )


def sql_embedding_lsh_topk(k: int = 10, query_mod: int = 50, n_planes: int = 8,
                           dim: int = 64) -> str:
    bucket = _band_bucket_sql("embedding", 0, n_planes, dim)
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         {bucket} AS bucket
  FROM embeddings
),
pairs AS (
  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
         round(list_dot_product(q.e, d.e) / (q.nrm * d.nrm), 6) AS cos_r
  FROM v q JOIN v d ON d.bucket = q.bucket AND d.vec_id <> q.vec_id
  WHERE q.vec_id % {query_mod} = 0
),
ranked AS (
  SELECT q_id, n_id, cos_r,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, n_id) AS rn
  FROM pairs
)
SELECT q_id, n_id, cos_r, CAST(rn AS INT) AS rnk FROM ranked WHERE rn <= {k}
"""


# ------------------------------------------------------------- IVF ANN ---
# FAISS-style IVF: coarse centroids partition the vector space; a query
# probes only its nprobe nearest lists and reranks exactly inside them.
# Everything that decides BUCKET MEMBERSHIP is exact int64 arithmetic on
# Q_SCALE-quantized vectors (squared L2 to each centroid, ties to the
# smallest centroid index), so the DuckDB oracle replays assignments and
# probe sets identically; only the final rerank is float (round 6, the
# proven-stable cross-engine pattern).

IVF_NLIST = 16
IVF_NPROBE = 4
IVF_CENT_EVERY = 31   # centroids = first nlist vectors with id % 31 == 7
IVF_CENT_OFF = 7


def _quantize_py(vec) -> list[int]:
    import math

    return [int(math.floor(float(x) * Q_SCALE)) for x in vec]


def _qvec_spark(vec_col: str) -> str:
    return (
        f"transform({vec_col}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {Q_SCALE}.0) AS BIGINT))"
    )


def _d2_spark(qv_col: str, cent: list[int]) -> str:
    arr = ", ".join(f"CAST({c} AS BIGINT)" for c in cent)
    return (
        f"aggregate(zip_with({qv_col}, array({arr}), (a, b) -> (a - b) * (a - b)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def ivf_centroids(emb: DataFrame, nlist: int = IVF_NLIST,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> list[list[int]]:
    """Deterministic 'training': the first nlist vectors (by id) of the
    id % IVF_CENT_EVERY == IVF_CENT_OFF stratum, quantized.  Collecting
    nlist×dim ints to the driver is the IVF train step (offline in FAISS
    too) — O(nlist), not O(n)."""
    rows = (
        emb.filter(F.col(id_col) % IVF_CENT_EVERY == IVF_CENT_OFF)
        .orderBy(id_col)
        .limit(nlist)
        .select(vec_col)
        .collect()
    )
    return [_quantize_py(r[0]) for r in rows]


def embedding_ivf_topk(
    emb: DataFrame, k: int = 10, query_mod: int = 50,
    nlist: int = IVF_NLIST, nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF: exact-int64 nearest-centroid
    assignment buckets the vectors; each query probes its nprobe nearest
    lists (equi-join on list id — no cross join), exact cosine rerank.
    Recall vs `embedding_topk` measured in tests."""
    from pyspark.sql import Window

    cents = ivf_centroids(emb, nlist, id_col, vec_col)
    nlist = len(cents)  # tiny tables may yield fewer
    if nlist == 0:
        # Degenerate input: the training stratum is empty, so there are no
        # inverted lists and no probe candidates.  The SQL twin yields zero
        # rows for the same reason; mirror it with a typed empty result
        # (a zero-element array() literal would otherwise be NULL-typed and
        # break array_position at analysis time).
        return emb.select(
            F.col(id_col).alias("q_id"), F.col(id_col).alias("n_id"),
            F.lit(0.0).alias("cos_r"), F.lit(0).cast("int").alias("rnk"),
        ).filter(F.lit(False))
    d2s = [_d2_spark("qv", c) for c in cents]
    d_arr = "array(" + ", ".join(d2s) + ")"

    norm = F.sqrt(F.expr(_dot_expr(vec_col, vec_col)))
    base = emb.select(
        F.col(id_col), F.col(vec_col), norm.alias("nrm"),
        F.expr(_qvec_spark(vec_col)).alias("qv"),
    ).withColumn("d_arr", F.expr(d_arr)).drop("qv")
    v = base.withColumn(
        "list_id", F.expr("array_position(d_arr, array_min(d_arr))").cast("int")
    ).drop("d_arr")

    q = base.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col("nrm").alias("q_nrm"), "d_arr",
    )
    probes = q.select(
        "q_id", "q_vec", "q_nrm",
        F.explode(F.expr(f"sequence(1, {nlist})")).alias("list_id"),
        F.expr("d_arr").alias("d_arr"),
    ).withColumn("d2", F.expr("element_at(d_arr, list_id)")).drop("d_arr")
    wq = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("list_id").asc())
    probes = (
        probes.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("q_id", "q_vec", "q_nrm", F.col("list_id").cast("int").alias("list_id"))
    )

    pairs = F.broadcast(probes).join(v, "list_id").filter(F.col(id_col) != F.col("q_id"))
    cos = F.expr(_dot_expr("q_vec", vec_col)) / (F.col("q_nrm") * F.col("nrm"))
    pairs = pairs.withColumn("cos_r", F.round(cos, 6))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_r").desc(), F.col(id_col).asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", F.col(id_col).alias("n_id"), "cos_r", F.col("rnk").cast("int").alias("rnk"))
    )


def sql_embedding_ivf_topk(k: int = 10, query_mod: int = 50,
                           nlist: int = IVF_NLIST, nprobe: int = IVF_NPROBE,
                           dim: int = 64) -> str:
    """DuckDB twin: recomputes the SAME centroids from the table (CTE) and
    replays assignment/probing with identical exact int64 arithmetic."""
    qv = (
        f"list_transform(generate_series(1, {dim}), i -> "
        f"CAST(floor(CAST(embedding[i] AS DOUBLE) * {Q_SCALE}.0) AS BIGINT))"
    )
    d2 = (
        f"list_sum(list_transform(generate_series(1, {dim}), i -> "
        f"(v.qv[i] - c.qv[i]) * (v.qv[i] - c.qv[i])))"
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         {qv} AS qv
  FROM embeddings
),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS list_id, qv
  FROM base WHERE vec_id % {IVF_CENT_EVERY} = {IVF_CENT_OFF}
  ORDER BY vec_id LIMIT {nlist}
),
dists AS (
  SELECT v.vec_id, c.list_id, CAST({d2} AS BIGINT) AS d2
  FROM base v, cent c
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS q_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
    FROM dists WHERE vec_id % {query_mod} = 0
  ) WHERE rn <= {nprobe}
),
pairs AS (
  SELECT p.q_id, v.vec_id AS n_id,
         round(list_dot_product(qb.e, v.e) / (qb.nrm * v.nrm), 6) AS cos_r
  FROM probes p
  JOIN assign a ON a.list_id = p.list_id
  JOIN base v ON v.vec_id = a.vec_id AND v.vec_id <> p.q_id
  JOIN base qb ON qb.vec_id = p.q_id
),
ranked AS (
  SELECT q_id, n_id, cos_r,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, n_id) AS rn
  FROM pairs
)
SELECT q_id, n_id, cos_r, CAST(rn AS INT) AS rnk FROM ranked WHERE rn <= {k}
"""


# Band-OR parameters for embedding_near_dups.  NOTE on the defaults: the
# test corpus' near-dup pairs sit just above cos 0.4 (random-vector tail),
# the worst case for sign-LSH (per-plane agreement 0.63 vs 0.50 noise), so
# 12 bands x 4 planes only reaches ~0.81 recall there.  At realistic
# near-dup thresholds (cos >= 0.9) the same machinery exceeds 0.99 recall
# with tiny candidate sets — measured in tests/test_dedup_text.py.
EMB_ND_BANDS = 12
EMB_ND_PLANES = 4


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.4,
    n_bands: int = EMB_ND_BANDS, planes_per_band: int = EMB_ND_PLANES,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH:
    candidates are pairs sharing ANY band bucket (equi-join per band, no
    cross join anywhere in the plan), then exact-cosine verified with
    round(cos, 6) > threshold.  Candidate generation is O(colliding pairs);
    buckets are integer-exact so the DuckDB oracle replays the identical
    algorithm (same candidates, same verdicts)."""
    norm = F.sqrt(F.expr(_dot_expr(vec_col, vec_col)))
    v = emb.select(F.col(id_col), F.col(vec_col), norm.alias("nrm"))
    stacked = None
    for band in range(n_bands):
        part = emb.select(
            F.col(id_col),
            F.lit(band).alias("band"),
            F.expr(_band_bucket_spark(vec_col, band, planes_per_band, dim)).alias("bkt"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    a = stacked.select(F.col(id_col).alias("a_id"), "band", "bkt")
    b = stacked.select(F.col(id_col).alias("b_id"), "band", "bkt")
    cand = (
        a.join(b, ["band", "bkt"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    av = v.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"), F.col("nrm").alias("a_nrm"))
    bv = v.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"), F.col("nrm").alias("b_nrm"))
    pairs = cand.join(av, "a_id").join(bv, "b_id")
    cos = F.expr(_dot_expr("a_vec", "b_vec")) / (F.col("a_nrm") * F.col("b_nrm"))
    return (
        pairs.withColumn("cos_r", F.round(cos, 6))
        .filter(F.col("cos_r") > threshold)
        .select("a_id", "b_id", "cos_r")
    )


def embedding_near_dups_bruteforce(
    emb: DataFrame, threshold: float = 0.4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs near-dup reference — TEST ORACLE ONLY (O(n²) cross
    join; never the registered driver path)."""
    norm = F.sqrt(F.expr(_dot_expr(vec_col, vec_col)))
    v = emb.select(F.col(id_col), F.col(vec_col), norm.alias("nrm"))
    a = v.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"), F.col("nrm").alias("a_nrm"))
    b = v.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"), F.col("nrm").alias("b_nrm"))
    pairs = F.broadcast(a).crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    cos = F.expr(_dot_expr("a_vec", "b_vec")) / (F.col("a_nrm") * F.col("b_nrm"))
    return (
        pairs.withColumn("cos_r", F.round(cos, 6))
        .filter(F.col("cos_r") > threshold)
        .select("a_id", "b_id", "cos_r")
    )


def sql_embedding_near_dups(
    threshold: float = 0.4,
    n_bands: int = EMB_ND_BANDS, planes_per_band: int = EMB_ND_PLANES,
    dim: int = 64,
) -> str:
    """DuckDB twin of the BANDED `embedding_near_dups` (same candidate
    generation, same verify) — not the brute-force all-pairs query."""
    band_selects = " UNION ALL ".join(
        f"SELECT vec_id, {band} AS band, "
        f"{_band_bucket_sql('embedding', band, planes_per_band, dim)} AS bkt FROM embeddings"
        for band in range(n_bands)
    )
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
stacked AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM stacked a JOIN stacked b
    ON a.band = b.band AND a.bkt = b.bkt AND a.vec_id < b.vec_id
)
SELECT c.a_id, c.b_id,
       round(list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm), 6) AS cos_r
FROM cand c JOIN v va ON c.a_id = va.vec_id JOIN v vb ON c.b_id = vb.vec_id
WHERE round(list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm), 6) > {threshold!r}
"""


# ------------------------------------------------------- decontamination ---

def decontaminate(
    docs: DataFrame,
    eval_mod: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-overlap decontamination (the eval-leak check every
    training-data pipeline runs before a model sees the corpus): flag
    corpus documents sharing any word-5-gram shingle with the eval set.

    Here the eval set is the ``doc_id % eval_mod == 0`` stratum (a stand-in
    for the benchmark suite); in production it is the actual benchmark
    corpus.  Scale shape: the eval shingle set is SMALL by construction
    (benchmarks are thousands of docs vs a 10⁹-doc corpus), so it
    broadcasts; the corpus side streams through one equi-join on the
    shingle hash — no shuffle of the corpus, no pairwise work.

    Returns one row per non-eval document:
    (doc_id, n_shingles, n_hits, contaminated).
    """
    sh = doc_shingles(docs, text_col, id_col)
    eval_sh = (
        sh.filter(F.col(id_col) % eval_mod == 0).select("shingle_h").distinct()
    )
    corpus = sh.filter(F.col(id_col) % eval_mod != 0)
    sizes = corpus.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        corpus.join(F.broadcast(eval_sh), "shingle_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    base = docs.filter(F.col(id_col) % eval_mod != 0).select(id_col)
    return (
        base.join(sizes, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles"),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def sql_decontaminate(eval_mod: int = 40) -> str:
    return f"""
WITH {_SHINGLES_CTE.strip().rstrip()},
eval_sh AS (
  SELECT DISTINCT shingle_h FROM shingles WHERE doc_id % {eval_mod} = 0
),
corpus AS (SELECT * FROM shingles WHERE doc_id % {eval_mod} <> 0),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
hits AS (
  SELECT c.doc_id, count(*) AS n_hits
  FROM corpus c JOIN eval_sh e USING (shingle_h) GROUP BY c.doc_id
)
SELECT d.doc_id,
       coalesce(s.n_shingles, 0) AS n_shingles,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {eval_mod} <> 0) d
LEFT JOIN sizes s USING (doc_id)
LEFT JOIN hits h USING (doc_id)
"""


# ------------------------------------------------- incremental-ingest dedup ---

_bounded_delta_cache = make_bounded_cache()  # flagged shingles (delta dedup)
_bounded_novel_cache = make_bounded_cache()  # flagged shingles (novelty)


def delta_jaccard_pairs(
    docs: DataFrame,
    new_col: str = "is_new",
    threshold_num: int = 1,
    threshold_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = JACCARD_MAX_SHINGLE_DF,
) -> DataFrame:
    """Incremental-ingest dedup — which NEW documents near-duplicate the
    EXISTING corpus?  :func:`jaccard_pairs` restricted ACROSS the batch
    split (new probe side × old build side, never new×new or old×old),
    the shape of a daily crawl landing against a 10⁹-doc catalog:

      J(new, old) ≥ num/den  ⟺  den·inter ≥ num·(s_new + s_old − inter)

    exact integer arithmetic over the capped shingle space (the
    stop-shingle DF cap is computed over the WHOLE corpus — old + new —
    so a shingle hot in the catalog stays dropped for the delta too).
    The inverted-index join's probe side is only the NEW batch's
    shingles: candidate cost scales with the delta, not the catalog.

    Output: ``(new_id, old_id, inter, s_new, s_old)``.
    """
    sh = docs.select(
        F.col(id_col),
        F.col(new_col).cast("boolean").alias("__new"),
        F.explode(F.expr(shingles_spark_expr(text_col, SHINGLE_K))).alias("sh"),
    ).select(id_col, "__new", F.expr(h0_spark_expr("sh")).alias("shingle_h"))
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle_h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle_h")
        )
        sh = sh.join(F.broadcast(hot), "shingle_h", "left_anti")
    sh = _bounded_delta_cache(sh)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    new = sh.filter("__new").select(F.col(id_col).alias("new_id"), "shingle_h")
    old = sh.filter(~F.col("__new")).select(
        F.col(id_col).alias("old_id"), "shingle_h"
    )
    inter = (
        new.join(old, "shingle_h")
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(
            sizes.withColumnRenamed(id_col, "new_id").withColumnRenamed("sz", "s_new"),
            "new_id",
        )
        .join(
            sizes.withColumnRenamed(id_col, "old_id").withColumnRenamed("sz", "s_old"),
            "old_id",
        )
        .filter(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * (F.col("s_new") + F.col("s_old") - F.col("inter"))
        )
    )
    return out.select("new_id", "old_id", "inter", "s_new", "s_old")


def ngram_novelty(
    docs: DataFrame,
    new_col: str = "is_new",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-NEW-document n-gram novelty — what fraction of a new doc's
    distinct shingles has the existing corpus NEVER seen?  The positive
    companion to :func:`delta_jaccard_pairs` (dedup kills copies;
    novelty ranks what genuinely adds information):

      novelty = |shingles(doc) ∖ shingles(catalog)| / |shingles(doc)|

    UNCAPPED shingle sets (novelty needs the true sets — a stop-shingle
    is by definition not novel, so the cap would only bias the
    denominator).  The catalog side collapses to DISTINCT shingle
    hashes first, so the anti join runs against O(vocabulary), not
    O(catalog rows); counts exact ints, novelty one long/long division.

    Output: ``(doc_id, n_shingles, n_unseen, novelty)`` — one row per
    new document with ≥ 1 shingle.
    """
    sh = docs.select(
        F.col(id_col),
        F.col(new_col).cast("boolean").alias("__new"),
        F.explode(F.expr(shingles_spark_expr(text_col, SHINGLE_K))).alias("sh"),
    ).select(id_col, "__new", F.expr(h0_spark_expr("sh")).alias("shingle_h"))
    sh = _bounded_novel_cache(sh)
    seen = sh.filter(~F.col("__new")).select("shingle_h").distinct()
    new = sh.filter("__new").select(id_col, "shingle_h")
    tot = new.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    unseen = (
        new.join(seen, "shingle_h", "left_anti")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_unseen"))
    )
    j = tot.join(unseen, id_col, "left").select(
        id_col,
        "n_shingles",
        F.coalesce(F.col("n_unseen"), F.lit(0)).alias("n_unseen"),
    )
    return j.select(
        id_col,
        "n_shingles",
        "n_unseen",
        F.when(
            F.col("n_shingles") > 0, F.col("n_unseen") / F.col("n_shingles")
        ).alias("novelty"),
    )


# ------------------------------------------------------ winnowing (MOSS) ---

WINNOW_K = 12          # character k-gram length
WINNOW_W = 6           # winnowing window (guarantee: any match >= k+w-1
                       # chars shares a selected fingerprint)
WINNOW_A = 2654435761  # positional multiplier of the k-gram hash
WINNOW_M = 100000007   # multiplier modulus
WINNOW_P = 1000000007  # hash modulus
WINNOW_MAX_DF = 10     # stop-fingerprint cap (docs per fingerprint)
WINNOW_ORACLE_MAX_LEN = 2000  # position-enumeration bound of the SQL twin


def winnow_fingerprints(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Robust-winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    the MOSS algorithm): hash every character k-gram, slide a window of
    ``w`` consecutive hashes, and select the RIGHTMOST minimal hash of
    each full window — guaranteeing any shared substring of length
    >= k + w - 1 contributes at least one shared fingerprint, while
    keeping ~2/(w+1) of the grams.

    Determinism: the k-gram hash is an exact-integer polynomial (no
    engine-dependent hash function), and the rightmost-min tie-break
    replays bit-for-bit in any SQL engine (the oracle uses a
    lexicographic struct-min window on (hash, -position)).

    Implementation: ONE vectorized Arrow pass (``mapInPandas``) — the
    per-gram polynomial is k shifted multiply-accumulate sweeps over
    the codepoint array (utf-32 decode, exact int64) and the
    rightmost-min window is a reversed-argmin over a strided view.  A
    pure-SQL higher-order-function formulation is semantically
    identical but Catalyst interprets lambda bodies per element —
    measured ~20x slower at 5k docs; this is the documented
    "Arrow-batched when built-ins can't express it efficiently" path.
    Output is the DISTINCT (doc, position, hash) selected set,
    ~2·chars/(w+1) rows per doc; no shuffle at all (selection is
    row-local per document).
    """
    import numpy as np
    import pandas as pd

    weights = [((j + 1) * WINNOW_A) % WINNOW_M for j in range(k)]
    min_len = k + w - 1
    out_schema = f"{id_col} long, pos long, fph long"

    def winnow(batches):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_out, pos_out, fph_out = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) < min_len:
                    continue
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = codes.size - k + 1
                acc = np.zeros(n, dtype=np.int64)
                for j in range(k):
                    acc = (acc + codes[j : j + n] * weights[j]) % WINNOW_P
                sw = sliding_window_view(acc, w)
                j_right = w - 1 - sw[:, ::-1].argmin(axis=1)
                pos = np.arange(sw.shape[0], dtype=np.int64) + j_right
                sel = np.unique(np.stack([pos, acc[pos]], axis=1), axis=0)
                ids_out.append(np.full(sel.shape[0], did, dtype=np.int64))
                pos_out.append(sel[:, 0] + 1)  # 1-based positions
                fph_out.append(sel[:, 1])
            if not ids_out:
                continue
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids_out),
                    "pos": np.concatenate(pos_out),
                    "fph": np.concatenate(fph_out),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(winnow, out_schema)


def winnow_pairs(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_fp_df: int | None = WINNOW_MAX_DF,
    min_shared: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document containment/plagiarism candidates: pairs sharing
    >= ``min_shared`` winnowed fingerprints.  The fingerprint inverted
    index is the join key; ``max_fp_df`` drops fingerprints present in
    more than that many documents first (the jaccard_pairs stop-shingle
    convention: a hot fingerprint matches everything and carries no
    containment signal, while bounding the self-join fan-out per key at
    C(max_fp_df, 2)).  Output: (doc_a, doc_b, n_shared)."""
    fp = winnow_fingerprints(docs, k, w, text_col, id_col)
    fpd = fp.select(F.col(id_col), "fph").distinct()
    if max_fp_df is not None:
        keep = (
            fpd.groupBy("fph")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_fp_df)
            .select("fph")
        )
        fpd = fpd.join(keep, "fph")
    a = fpd.select(F.col(id_col).alias("doc_a"), "fph")
    b = fpd.select(F.col(id_col).alias("doc_b"), "fph")
    return (
        a.join(b, "fph")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def sql_winnow_pairs(
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_fp_df: int | None = WINNOW_MAX_DF,
    min_shared: int = 4,
) -> str:
    """DuckDB twin of :func:`winnow_pairs` over the ``documents`` view.
    Positions enumerate from a fixed range (WINNOW_ORACLE_MAX_LEN) —
    valid for corpora with text length under that bound."""
    cap = ""
    src = "fpd"
    if max_fp_df is not None:
        cap = f"""
keep AS (
  SELECT fph FROM fpd GROUP BY fph HAVING count(*) <= {max_fp_df}
),
capped AS (SELECT fpd.doc_id, fpd.fph FROM fpd JOIN keep USING (fph)),"""
        src = "capped"
    return f"""
WITH grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST(list_sum(list_transform(generate_series(0, {k - 1}, 1), j ->
           CAST(unicode(substr(text, CAST(i + j AS INT), 1)) AS BIGINT)
           * (((j + 1) * {WINNOW_A}) % {WINNOW_M}))) % {WINNOW_P} AS BIGINT) AS h
  FROM documents, range(1, {WINNOW_ORACLE_MAX_LEN + 1}) t(i)
  WHERE length(text) >= {k + w - 1} AND i <= length(text) - {k} + 1
),
win AS (
  SELECT doc_id, i, h,
         min({{'h': h, 'ni': -i}}) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS sel,
         count(*) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS nw
  FROM grams
),
fpd AS (
  SELECT DISTINCT doc_id, (sel).h AS fph FROM win WHERE nw = {w}
),{cap}
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM {src} a JOIN {src} b USING (fph)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= {min_shared}
)
SELECT doc_a, doc_b, n_shared FROM pairs
"""


_bound_ppjoin_cache = make_bounded_cache()


def ppjoin_pairs(
    docs: DataFrame, threshold_num: int = 1, threshold_den: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
    max_shingle_df: int | None = JACCARD_MAX_SHINGLE_DF,
) -> DataFrame:
    """EXACT set-similarity join via the prefix filter (PPJoin family,
    Xiao et al. 2008 — the candidate-reduction lemma only, without the
    positional refinement): identical output to :func:`jaccard_pairs`
    at the same threshold (pinned by test), but candidates come from a
    PREFIX inverted index instead of the full one.

    Lemma: order every doc's shingles by one GLOBAL total order
    (document frequency ASC, hash — rarest first, the best pruning
    order); if J(A,B) ≥ n/d then A and B must share a shingle among
    each one's first ``|s| − ⌈n·|s|/d⌉ + 1`` shingles.  At threshold
    1/2 the prefix is ~half the set, and it is the RARE half — the
    posting lists that actually join are the short ones, so candidate
    volume drops superlinearly vs the full index (hot shingles never
    generate candidates even below the stop-shingle cap).

    Verify stage is ROW-LOCAL: per-doc sorted shingle arrays join the
    candidate pairs and ``size(array_intersect())`` gives the exact
    overlap — no second corpus-wide shuffle on the shingle key, the
    arrays are bounded by doc length.  Same hot-shingle cap as
    `jaccard_pairs` so the Jaccard space is identical.

    Output: ``(a_id, b_id, inter, sa, sb)`` — exactly jaccard_pairs'.
    """
    from pyspark.sql import Window

    sh = doc_shingles(docs, text_col, id_col)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle_h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle_h")
        )
        sh = sh.join(F.broadcast(hot), "shingle_h", "left_anti")
    sh = _bound_ppjoin_cache(sh)
    dfreq = sh.groupBy("shingle_h").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy("df", "shingle_h")
    ranked = (
        sh.join(dfreq, "shingle_h")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("sz", F.count("*").over(Window.partitionBy(id_col)))
    )
    # prefix_len = sz − ⌈(n·sz)/d⌉ + 1, all integer
    pref = ranked.filter(
        F.col("pos")
        <= F.col("sz")
        - F.expr(f"({threshold_num} * sz + {threshold_den} - 1) DIV {threshold_den}")
        + 1
    )
    a = pref.select(F.col(id_col).alias("a_id"), "shingle_h")
    b = pref.select(F.col(id_col).alias("b_id"), "shingle_h")
    cand = (
        a.join(b, "shingle_h")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sets = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_list("shingle_h")).alias("arr"),
        F.count("*").alias("sz"),
    )
    j = (
        cand.join(
            sets.select(F.col(id_col).alias("a_id"), F.col("arr").alias("la"),
                        F.col("sz").alias("sa")),
            "a_id",
        )
        .join(
            sets.select(F.col(id_col).alias("b_id"), F.col("arr").alias("lb"),
                        F.col("sz").alias("sb")),
            "b_id",
        )
        .withColumn("inter", F.size(F.array_intersect(F.col("la"), F.col("lb"))).cast("long"))
    )
    return j.filter(
        F.lit(threshold_den) * F.col("inter")
        >= F.lit(threshold_num) * (F.col("sa") + F.col("sb") - F.col("inter"))
    ).select("a_id", "b_id", "inter", "sa", "sb")


def sql_ppjoin_pairs(
    threshold_num: int = 1, threshold_den: int = 2,
    max_shingle_df: int | None = JACCARD_MAX_SHINGLE_DF,
) -> str:
    cap_cte = ""
    src = "shingles"
    if max_shingle_df is not None:
        cap_cte = f"""
capped AS (
  SELECT s.doc_id, s.shingle_h FROM shingles s
  JOIN (SELECT shingle_h FROM shingles GROUP BY 1
        HAVING count(*) <= {max_shingle_df}) k USING (shingle_h)
),"""
        src = "capped"
    return f"""
WITH {_SHINGLES_CTE},{cap_cte}
dfreq AS (SELECT shingle_h, count(*) AS df FROM {src} GROUP BY 1),
ranked AS (
  SELECT s.doc_id, s.shingle_h,
         row_number() OVER (PARTITION BY s.doc_id
                            ORDER BY d.df, s.shingle_h) AS pos,
         count(*) OVER (PARTITION BY s.doc_id) AS sz
  FROM {src} s JOIN dfreq d USING (shingle_h)
),
pref AS (
  SELECT doc_id, shingle_h FROM ranked
  WHERE pos <= sz - (({threshold_num} * sz + {threshold_den} - 1)
                     // {threshold_den}) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM pref a JOIN pref b ON a.shingle_h = b.shingle_h AND a.doc_id < b.doc_id
),
sets AS (
  SELECT doc_id, list_sort(list(shingle_h)) AS arr,
         CAST(count(*) AS BIGINT) AS sz
  FROM {src} GROUP BY 1
)
SELECT c.a_id, c.b_id,
       CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT) AS inter,
       sa.sz AS sa, sb.sz AS sb
FROM cand c
JOIN sets sa ON sa.doc_id = c.a_id
JOIN sets sb ON sb.doc_id = c.b_id
WHERE {threshold_den} * CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT)
      >= {threshold_num} * (sa.sz + sb.sz
                            - CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT))
"""
