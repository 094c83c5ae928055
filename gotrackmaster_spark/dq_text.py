"""Text/dedup/search queries over the documents table — split from driver_queries.py (round 4 registry
hygiene); star-re-exported by gotrackmaster_spark.driver_queries, which
remains the single public surface.  See driver_queries.py for the
determinism rules every query/oracle pair follows."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gotrackmaster_spark.caching import make_bounded_cache
from gotrackmaster_spark.functions.cells import cell_col, cell_sql
from gotrackmaster_spark.functions.geodesy import (
    bearing_col,
    bearing_sql,
    distance_2d_col,
    distance_2d_sql,
    haversine_col,
    haversine_sql,
)
from gotrackmaster_spark.functions.tiles import (
    lat_tile_col,
    lat_tile_sql,
    lon_tile_col,
    lon_tile_sql,
    mercator_tile_cols,
    mercator_tile_sql,
    tile_name_col,
    tile_name_sql,
)

from gotrackmaster_spark.dq_common import *  # noqa: F401,F403,E402


def q_geo_text_search(spark, sf_dir):
    """Multimodal geo search: which tiles hold images whose CAPTION
    matches any of a query-term set — the image+caption pairing as a
    search primitive.  Captions scan once with per-term substring flags
    (codegen), geotag by the image key, one tile aggregate.  At 10¹²
    rows the term filter pushes into the caption scan; no join, no
    Python."""
    docs = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    hit = [F.when(F.contains(low, F.lit(t)), 1).otherwise(0).alias(f"h{i}")
           for i, t in enumerate(_GEO_SEARCH_TERMS)]
    lat, lon = _img_geotag_cols(F.col("doc_id"))
    tagged = docs.select(
        "doc_id", *hit, tile_name_col(lat, lon, 1.0).alias("tile")
    ).filter(sum(F.col(f"h{i}") for i in range(len(_GEO_SEARCH_TERMS))) > 0)
    aggs = [F.sum(f"h{i}").alias(f"n_{t}") for i, t in enumerate(_GEO_SEARCH_TERMS)]
    return tagged.groupBy("tile").agg(F.count("*").alias("n_docs"), *aggs)


def _sql_geo_text_search() -> str:
    hits = ", ".join(
        f"CASE WHEN contains(lower(text), '{t}') THEN 1 ELSE 0 END AS h{i}"
        for i, t in enumerate(_GEO_SEARCH_TERMS)
    )
    sums = ", ".join(
        f"CAST(sum(h{i}) AS BIGINT) AS n_{t}" for i, t in enumerate(_GEO_SEARCH_TERMS)
    )
    cond = " + ".join(f"h{i}" for i in range(len(_GEO_SEARCH_TERMS)))
    return f"""
WITH tagged AS (
  SELECT doc_id, {hits},
         {tile_name_sql("((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0",
                        "((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0", 1.0)} AS tile
  FROM documents
)
SELECT tile, count(*) AS n_docs, {sums}
FROM tagged WHERE {cond} > 0 GROUP BY tile
"""


SQL_GEO_TEXT_SEARCH = _sql_geo_text_search()


# --------------------------------------------------------------------------
# Text analysis — token counting + per-language stats over `documents`
# --------------------------------------------------------------------------

def q_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    return (
        docs.select("lang", toks.alias("n_tokens"), F.col("n_chars"))
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("sum_tokens"),
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


SQL_TOKEN_STATS = """
SELECT lang,
       CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS sum_tokens,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# Document fingerprint — position-weighted codepoint hash (exact int64)
# --------------------------------------------------------------------------

def _fp_col(text: str, a: int, p: int):
    return F.expr(
        f"aggregate(transform(sequence(1, length({text})), i -> "
        f"CAST(ascii(substring({text}, i, 1)) AS BIGINT) * ((i * {a}) % 100000007)), "
        f"CAST(0 AS BIGINT), (acc, v) -> (acc + v) % {p})"
    )


def _fp_sql(text: str, a: int, p: int) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, length({text})), i -> "
        f"CAST(unicode(substr({text}, i, 1)) AS BIGINT) * ((i * {a}) % 100000007))) % {p}"
        f" AS BIGINT)"
    )


def q_doc_fingerprints(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", _fp_col("text", 2654435761, 1000000007).alias("fp")
    )


SQL_DOC_FINGERPRINTS = f"""
SELECT doc_id, {_fp_sql('text', 2654435761, 1000000007)} AS fp
FROM documents
"""

# --------------------------------------------------------------------------
# Dedup + text-analysis + similarity-search suite (operators.dedup,
# functions.text) — training-data pipeline operators with exact oracles
# --------------------------------------------------------------------------

from gotrackmaster_spark.functions.text import (  # noqa: E402
    bpe_token_count_col,
    bpe_token_count_sql,
    lang_pred_col,
    lang_pred_sql,
    quality_score_col,
    quality_score_sql,
)


_JACCARD_NUM, _JACCARD_DEN = 1, 10


def q_jaccard_pairs(spark, sf_dir):
    return D.jaccard_pairs(
        _t(spark, sf_dir, "documents"), _JACCARD_NUM, _JACCARD_DEN
    )


SQL_JACCARD_PAIRS = D.sql_jaccard_pairs(_JACCARD_NUM, _JACCARD_DEN)


def q_minhash_band_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return D.lsh_candidate_pairs(D.minhash_signatures(docs))


SQL_MINHASH_BAND_PAIRS = D.sql_minhash_band_pairs()


def q_lang_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_pred_col("text").alias("pred_lang"),
        quality_score_col("text").alias("quality"),
        # long: DuckDB's twin is BIGINT — keep widths identical so any
        # typed-hash driver comparison stays width-proof
        bpe_token_count_col("text").cast("long").alias("bpe_tokens"),
    )


SQL_LANG_QUALITY = f"""
SELECT doc_id,
       {lang_pred_sql('text')} AS pred_lang,
       {quality_score_sql('text')} AS quality,
       {bpe_token_count_sql('text')} AS bpe_tokens
FROM documents
"""


def q_repetition_stats(spark, sf_dir):
    """Per-source repetition profile: top-token mass, type counts,
    duplicate-bigram counts, and the Gopher-style repetitive-doc counter
    (top token >= 10% of the doc)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    per_doc = _per_doc_token_stats(docs)
    ptoks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bgs = (
        ptoks.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bg"))
    )
    per_doc_bg = (
        bgs.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.sum("c") - F.count("*")).alias("dup_bigrams"))
    )
    joined = per_doc.join(per_doc_bg, "doc_id", "left").fillna(
        {"dup_bigrams": 0}
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("max_tf").alias("sum_max_tf"),
        F.sum("n_types").alias("sum_types"),
        F.sum("dup_bigrams").alias("sum_dup_bigrams"),
        F.sum(
            F.when(F.col("max_tf") * 10 >= F.col("n_tok"), 1).otherwise(0)
        ).alias("n_repetitive"),
    )


SQL_REPETITION_STATS = f"""
WITH {_SQL_PER_DOC},
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(l) - 1),
                               i -> l[i] || ' ' || l[i + 1])) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
),
bgf AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
per_doc_bg AS (
  SELECT doc_id, CAST(sum(c) - count(*) AS BIGINT) AS dup_bigrams
  FROM bgf GROUP BY doc_id
)
SELECT p.source, count(*) AS n_docs,
       CAST(sum(p.max_tf) AS BIGINT) AS sum_max_tf,
       CAST(sum(p.n_types) AS BIGINT) AS sum_types,
       CAST(sum(coalesce(b.dup_bigrams, 0)) AS BIGINT) AS sum_dup_bigrams,
       CAST(sum(CASE WHEN p.max_tf * 10 >= p.n_tok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitive
FROM per_doc p LEFT JOIN per_doc_bg b USING (doc_id)
GROUP BY p.source
"""


def q_heavy_hitters(spark, sf_dir):
    """Corpus top-20 tokens (total order: count desc, token asc).  Scale
    path: partial map-side agg collapses each partition to its vocabulary
    before the single shuffle; for open vocabularies at 100 TB swap the
    exact agg for a count-min sketch + candidate re-count — the exact
    form here doubles as that pipeline's verifier."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.col("tok"))
        .limit(20)
    )


SQL_HEAVY_HITTERS = """
SELECT tok, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok ORDER BY n DESC, tok LIMIT 20
"""


# --------------------------------------------------------------------------
# Text pipeline — character-trigram LM quality score (perplexity-style
# filtering, the CCNet/Gopher "does this read like the corpus?" signal):
# train = trigram counts over the whole corpus (one groupBy), score = each
# doc's mean log10 P(c3 | c1c2) with add-one smoothing over a fixed
# V=256 alphabet.  P's denominator uses prefix-bigram mass derived FROM
# the trigram counts (sum of C3 over the prefix), so both engines build
# the identical integer model; only the final mean is float (round 7 —
# summation-order error ~1e-13, 6 orders below the step).
#
# Scale shape: two groupBys over the exploded trigram stream (partial
# aggregation does the heavy lifting), then equi-joins of the stream
# against the counts tables — no collect, model stays distributed.
# Spark quirk guarded: sequence(1, 0) DESCENDS (it is not empty), so docs
# shorter than 3 chars are filtered before the explode on BOTH sides.
# --------------------------------------------------------------------------

_LM_V = 256.0


def q_lm_scores(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tris = docs.filter(F.length("text") >= 3).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
        ).alias("tri"),
    )
    c3 = tris.groupBy("tri").agg(F.count("*").alias("n3"))
    c2 = c3.groupBy(F.substring("tri", 1, 2).alias("bi")).agg(F.sum("n3").alias("n2"))
    scored = (
        tris.join(c3, "tri")
        .withColumn("bi", F.substring("tri", 1, 2))
        .join(c2, "bi")
        .select(
            "doc_id",
            F.log10((F.col("n3") + 1.0) / (F.col("n2") + F.lit(_LM_V))).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tri"), F.round(F.avg("lp"), 7).alias("lm_score")
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri"),
        F.coalesce(F.col("lm_score"), F.lit(0.0)).alias("lm_score"),
    )


SQL_LM_SCORES = f"""
WITH tris AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS tri
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - 2)) AS i
    FROM documents WHERE length(text) >= 3
  )
),
c3 AS (SELECT tri, count(*) AS n3 FROM tris GROUP BY tri),
c2 AS (SELECT substr(tri, 1, 2) AS bi, sum(n3) AS n2 FROM c3 GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         log10((c3.n3 + 1.0) / (c2.n2 + {_LM_V!r})) AS lp
  FROM tris t
  JOIN c3 USING (tri)
  JOIN c2 ON c2.bi = substr(t.tri, 1, 2)
),
per_doc AS (
  SELECT doc_id, count(*) AS n_tri, round(avg(lp), 7) AS lm_score
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_tri, 0) AS n_tri,
       coalesce(p.lm_score, 0.0) AS lm_score
FROM (SELECT doc_id FROM documents) d
LEFT JOIN per_doc p USING (doc_id)
"""


# --------------------------------------------------------------------------
# Text pipeline — benchmark decontamination (eval-leak check): corpus docs
# sharing any word-5-gram shingle with the eval stratum are flagged.
# Same shingle machinery as jaccard_pairs (functions/text.py); the eval
# shingle set broadcasts (benchmarks are tiny vs the corpus), the corpus
# side streams through one equi-join — no corpus shuffle, no pairwise work.
# --------------------------------------------------------------------------

_DECON_MOD = 40


def q_decontamination(spark, sf_dir):
    from gotrackmaster_spark.operators.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return decontaminate(docs, eval_mod=_DECON_MOD)


from gotrackmaster_spark.operators.dedup import sql_decontaminate as _sql_decon  # noqa: E402

SQL_DECONTAMINATION = _sql_decon(_DECON_MOD)


# --------------------------------------------------------------------------
# Training-sequence assembly — stride chunking (pure codegen) and greedy
# next-fit token packing (sharded applyInPandas; recursive-CTE oracle).
# --------------------------------------------------------------------------


def q_doc_chunks(spark, sf_dir):
    from gotrackmaster_spark.operators.packing import chunk_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, chunk_tokens=64, stride_tokens=48)


def q_seq_packing(spark, sf_dir):
    from gotrackmaster_spark.operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(docs, budget=256, n_shards=8)


from gotrackmaster_spark.operators.packing import (  # noqa: E402
    sql_chunk_documents as _sql_chunks,
    sql_pack_sequences as _sql_pack,
)

SQL_DOC_CHUNKS = _sql_chunks(chunk_tokens=64, stride_tokens=48)
SQL_SEQ_PACKING = _sql_pack(budget=256, n_shards=8)


# --------------------------------------------------------------------------
# E26 — distinctive terms per tile (`tile_top_terms` composite): the
# text×geo leg — per 10° tile, the top-3 caption terms ranked by the
# INTEGER-QUANTIZED tf/df score (tf·10⁶ DIV df; a float tf-idf with ln
# would make near-tie ranking engine-dependent).  One word explode,
# two hash aggregates, the tiny global df table broadcast back; rank =
# (score DESC, term ASC) — fully deterministic.
# --------------------------------------------------------------------------

_TTT_K = 3
_TTT_QUANT = 10**6
_TTT_TILE_DEG = 10.0


def q_tile_top_terms(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    lat, lon = _img_geotag_cols(F.col("doc_id"))
    words = docs.select(
        "doc_id",
        tile_name_col(lat, lon, _TTT_TILE_DEG).alias("tile"),
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).filter(F.length("term") > 0)
    tf = words.groupBy("tile", "term").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    j = tf.join(F.broadcast(df_), "term").withColumn(
        "score", F.expr(f"(tf * {_TTT_QUANT}) DIV df")
    )
    w = Window.partitionBy("tile").orderBy(F.col("score").desc(), "term")
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TTT_K)
        .select("tile", "term", "tf", "df", "score", "rnk")
    )


SQL_TILE_TOP_TERMS = f"""
WITH tagged AS (
  SELECT doc_id,
         {tile_name_sql("((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0",
                        "((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0",
                        _TTT_TILE_DEG)} AS tile,
         text
  FROM documents
),
words AS (
  SELECT doc_id, tile, unnest(string_split(lower(text), ' ')) AS term
  FROM tagged
),
flt AS (SELECT * FROM words WHERE length(term) > 0),
tf AS (SELECT tile, term, CAST(count(*) AS BIGINT) AS tf FROM flt GROUP BY 1, 2),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM flt GROUP BY 1),
j AS (
  SELECT tile, t.term, tf, df, (tf * {_TTT_QUANT}) // df AS score
  FROM tf t JOIN df USING (term)
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY tile ORDER BY score DESC, term)
                 AS INT) AS rnk
  FROM j
)
SELECT tile, term, tf, df, score, rnk FROM ranked WHERE rnk <= {_TTT_K}
"""


# --------------------------------------------------------------------------
# E33 — incremental-ingest dedup + novelty (`dedup.delta_jaccard_pairs`
# / `dedup.ngram_novelty`): the daily-crawl-against-catalog pair — new
# batch = doc_id % 5 = 4.  Delta dedup probes only the NEW shingles
# against the corpus inverted index (cost scales with the delta);
# novelty anti-joins each new doc's distinct shingles against the
# catalog VOCABULARY.  Exact ints; novelty one long/long division.
# --------------------------------------------------------------------------

_DELTA_NEW_MOD = 5
_DELTA_NEW_REM = 4


def _delta_docs(spark, sf_dir):
    return _t(spark, sf_dir, "documents").withColumn(
        "is_new", F.col("doc_id") % _DELTA_NEW_MOD == _DELTA_NEW_REM
    )


def q_delta_dedup(spark, sf_dir):
    from gotrackmaster_spark.operators.dedup import delta_jaccard_pairs

    return delta_jaccard_pairs(_delta_docs(spark, sf_dir))


def q_ngram_novelty(spark, sf_dir):
    from gotrackmaster_spark.operators.dedup import ngram_novelty

    return ngram_novelty(_delta_docs(spark, sf_dir))


def _sql_delta_flag() -> str:
    return f"doc_id % {_DELTA_NEW_MOD} = {_DELTA_NEW_REM}"


def _sql_delta_dedup() -> str:
    from gotrackmaster_spark.operators.dedup import (
        JACCARD_MAX_SHINGLE_DF,
        _SHINGLES_CTE,
    )

    return f"""
WITH {_SHINGLES_CTE},
capped AS (
  SELECT s.doc_id, s.shingle_h FROM shingles s
  JOIN (SELECT shingle_h FROM shingles GROUP BY 1
        HAVING count(*) <= {JACCARD_MAX_SHINGLE_DF}) k USING (shingle_h)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS old_id, count(*) AS inter
  FROM capped a JOIN capped b ON a.shingle_h = b.shingle_h
  WHERE ({_sql_delta_flag().replace('doc_id', 'a.doc_id')})
    AND NOT ({_sql_delta_flag().replace('doc_id', 'b.doc_id')})
  GROUP BY 1, 2
)
SELECT i.new_id, i.old_id, i.inter, sa.sz AS s_new, sb.sz AS s_old
FROM inter i JOIN sizes sa ON i.new_id = sa.doc_id
             JOIN sizes sb ON i.old_id = sb.doc_id
WHERE 2 * i.inter >= 1 * (sa.sz + sb.sz - i.inter)
"""


def _sql_ngram_novelty() -> str:
    from gotrackmaster_spark.operators.dedup import _SHINGLES_CTE

    return f"""
WITH {_SHINGLES_CTE},
seen AS (
  SELECT DISTINCT shingle_h FROM shingles WHERE NOT ({_sql_delta_flag()})
),
new_sh AS (SELECT doc_id, shingle_h FROM shingles WHERE {_sql_delta_flag()}),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM new_sh GROUP BY 1),
unseen AS (
  SELECT n.doc_id, CAST(count(*) AS BIGINT) AS n_unseen
  FROM new_sh n LEFT JOIN seen s USING (shingle_h)
  WHERE s.shingle_h IS NULL
  GROUP BY 1
)
SELECT t.doc_id, t.n_shingles,
       CAST(coalesce(u.n_unseen, 0) AS BIGINT) AS n_unseen,
       CASE WHEN t.n_shingles > 0 THEN
         coalesce(u.n_unseen, 0) / t.n_shingles
       END AS novelty
FROM tot t LEFT JOIN unseen u ON t.doc_id = u.doc_id
"""


SQL_DELTA_DEDUP = _sql_delta_dedup()
SQL_NGRAM_NOVELTY = _sql_ngram_novelty()


# --------------------------------------------------------------------------
# E39 — term co-occurrence PMI (`term_pmi` composite): which caption
# term pairs co-occur more than chance?  Distinct terms per doc →
# within-doc pair self-join (bounded by vocabulary, the colocation
# shape) → INTEGER-QUANTIZED pointwise mutual information
# pmi_q = (n_ab·N·10⁶) DIV (n_a·n_b) (a float log PMI would rank
# near-ties engine-dependently; integer quotients cannot).
# --------------------------------------------------------------------------

_PMI_QUANT = 10**6
_PMI_MIN_PAIRS = 5


def q_term_pmi(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("term"),
    ).filter(F.length("term") > 0)
    # 1-row N attach (no driver-side count(): the scalar rides the plan)
    nd = words.agg(F.countDistinct("doc_id").alias("n_docs"))
    tf = words.groupBy("term").agg(F.count("*").alias("df"))
    a = words.select(F.col("doc_id"), F.col("term").alias("t_a"))
    b = words.select(F.col("doc_id"), F.col("term").alias("t_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_PAIRS)
    )
    # tf is the FULL vocabulary df table — O(vocab), never force-broadcast
    # (the r2 broadcast(sizes) lesson); the filtered pairs side is the
    # small one, and AQE picks the strategy per actual size.
    j = (
        pairs.join(tf.withColumnRenamed("term", "t_a").withColumnRenamed("df", "df_a"), "t_a")
        .join(tf.withColumnRenamed("term", "t_b").withColumnRenamed("df", "df_b"), "t_b")
    )
    j = j.crossJoin(F.broadcast(nd))
    pmi_q = F.expr(f"(n_ab * n_docs * {_PMI_QUANT}) DIV (df_a * df_b)")
    return j.select("t_a", "t_b", "n_ab", "df_a", "df_b", pmi_q.alias("pmi_q"))


def _sql_term_pmi(sf_dir_unused: str = "") -> str:
    return f"""
WITH words AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
  WHERE length(t.term) > 0
),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM words),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM words GROUP BY term),
pairs AS (
  SELECT a.term AS t_a, b.term AS t_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
  HAVING count(*) >= {_PMI_MIN_PAIRS}
)
SELECT p.t_a, p.t_b, p.n_ab, fa.df AS df_a, fb.df AS df_b,
       (p.n_ab * nd.n_docs * {_PMI_QUANT}) // (fa.df * fb.df) AS pmi_q
FROM pairs p
JOIN tf fa ON fa.term = p.t_a
JOIN tf fb ON fb.term = p.t_b
CROSS JOIN nd
"""


SQL_TERM_PMI = _sql_term_pmi()


# --------------------------------------------------------------------------
# E45 — robust-winnowing fingerprint dedup (`winnow_pairs`,
# operators/dedup.py::winnow_fingerprints/winnow_pairs): the MOSS
# algorithm — positional-polynomial k-gram hashes (exact int64), window
# of w hashes, rightmost-min selection via lexicographic struct-min on
# (hash, -pos); cross-doc pairs sharing >= 4 fingerprints after the
# stop-fingerprint cap.  Guarantee: any shared substring of length
# >= k + w - 1 shares a selected fingerprint.
# --------------------------------------------------------------------------


def q_winnow_pairs(spark, sf_dir):
    return D.winnow_pairs(_t(spark, sf_dir, "documents"))


SQL_WINNOW_PAIRS = D.sql_winnow_pairs()


SQL_BM25_SCORES = _sql_bm25_scores()


# --------------------------------------------------------------------------
# E59 — canonical document selection (`canonical_docs` composite): the
# final stage of the dedup pipeline — near-dup pairs → connected
# components → per-cluster KEEP decision by (quality score, lowest id)
# via one lexicographic struct-max; the engine-exact integer quality
# score (functions/text.py) makes the argmax deterministic.  Completes
# detection → clustering → canonicalization as driver-checked stages.
# --------------------------------------------------------------------------


def q_canonical_docs(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import connected_components

    pairs = q_simhash_near_dups(spark, sf_dir)
    comp = connected_components(pairs, "a_id", "b_id")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", quality_score_col("text").alias("q")
    )
    labeled = comp.join(docs, comp["v"] == docs["doc_id"])
    best = labeled.groupBy("l").agg(
        F.count("*").alias("n_docs"),
        F.max(
            F.struct(F.col("q"), (-F.col("v")).alias("nid"))
        ).alias("b"),
    )
    return best.select(
        F.col("l").alias("root"),
        "n_docs",
        F.col("b.q").alias("kept_quality"),
        (-F.col("b.nid")).alias("kept_id"),
    )


SQL_CANONICAL_DOCS = f"""
WITH RECURSIVE ed AS (
  SELECT a_id AS a, b_id AS b FROM ({SQL_SIMHASH_NEAR_DUPS}) s
  UNION
  SELECT b_id, a_id FROM ({SQL_SIMHASH_NEAR_DUPS}) s
),
nodes AS (SELECT DISTINCT a AS v FROM ed),
reach AS (
  SELECT v, v AS u FROM nodes
  UNION
  SELECT r.v, e.b AS u FROM reach r JOIN ed e ON e.a = r.u
),
comp AS (SELECT v, min(u) AS root FROM reach GROUP BY v),
q AS (SELECT doc_id, {quality_score_sql('text')} AS q FROM documents),
best AS (
  SELECT comp.root, count(*) AS n_docs,
         max({{'q': q.q, 'nid': -comp.v}}) AS b
  FROM comp JOIN q ON q.doc_id = comp.v
  GROUP BY comp.root
)
SELECT root, n_docs, (b).q AS kept_quality, -((b).nid) AS kept_id FROM best
"""


# --------------------------------------------------------------------------
# E64 — edit-distance verification of winnow candidates
# (`winnow_verified` composite): the MOSS verify stage — every
# fingerprint-candidate pair re-scored with FULL Levenshtein distance
# (unit costs: a well-defined integer both engines' builtins agree on)
# plus the quantized similarity ((maxlen − lev)·10⁶) DIV maxlen.  The
# candidate cut keeps the O(len²) dynamic program off the corpus —
# it runs on candidate PAIRS only, the two-stage
# cheap-filter → expensive-verify shape of every dedup pipeline here.
# --------------------------------------------------------------------------


def q_winnow_verified(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = D.winnow_pairs(_t(spark, sf_dir, "documents"))
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    lev = F.levenshtein(F.col("ta"), F.col("tb"))
    mx = F.greatest(F.length("ta"), F.length("tb")).cast("long")
    return j.select(
        "doc_a",
        "doc_b",
        "n_shared",
        lev.cast("long").alias("lev"),
        F.expr(
            "((greatest(length(ta), length(tb)) - levenshtein(ta, tb)) * 1000000)"
            " DIV greatest(length(ta), length(tb))"
        ).alias("sim_q"),
    )


SQL_WINNOW_VERIFIED = f"""
WITH pairs AS ({D.sql_winnow_pairs()})
SELECT p.doc_a, p.doc_b, p.n_shared,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
       ((greatest(length(a.text), length(b.text))
         - levenshtein(a.text, b.text)) * 1000000)
       // greatest(length(a.text), length(b.text)) AS sim_q
FROM pairs p
JOIN documents a ON a.doc_id = p.doc_a
JOIN documents b ON b.doc_id = p.doc_b
"""


# --------------------------------------------------------------------------
# E69 — positional phrase search (`phrase_search`,
# `search.phrase_search`): exact multi-phrase matching via ONE
# postings join against a broadcast (phrase, term, offset) dictionary
# and a distinct-offset reduction — no per-phrase join chains.  Mixed
# phrase lengths in one pass; repeated-term phrases can't double-count
# a posting (DISTINCT offsets).  The DuckDB twin is generated from the
# same dictionary literal.
# --------------------------------------------------------------------------

_PHRASES = [
    "slow hash batch",
    "part filter scan",
    "window fast query",
    "fast table",
    "table table",
]


def q_phrase_search(spark, sf_dir):
    from gotrackmaster_spark.operators.search import phrase_search

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_search(docs, _PHRASES)


SQL_PHRASE_SEARCH = None  # assigned below (generated twin)


def _sql_phrase_search() -> str:
    from gotrackmaster_spark.operators.search import sql_phrase_search

    return sql_phrase_search(_PHRASES)


SQL_PHRASE_SEARCH = _sql_phrase_search()


# --------------------------------------------------------------------------
# E78 — vocabulary growth / Heaps' law (`vocab_growth` composite):
# distinct vocabulary vs corpus size at doc-count checkpoints — the
# corpus-health curve (sub-linear growth is Heaps' law; a linear curve
# flags boilerplate/noise).  First-occurrence doc per term (one
# aggregate), bucketed + cumulative-window — NO inequality join against
# the checkpoint list.  Exact integers throughout.
#
# Scale note: the cumulative runs over the BUCKET ladder (n_docs/step
# rows — 2·10⁷ at 10⁹ docs with step 50), so it uses the pps_sample
# two-level cumsum: shard-partitioned prefix (shard = b DIV 2¹³ — a
# range bucket, so shard order extends bucket order) + exclusive
# per-shard-total offsets broadcast back (the offset table is
# O(buckets/2¹³) ≈ 2.4k rows at 10⁹ docs — genuinely broadcastable,
# unlike _rank_two_level's per-key offsets).  Exact integers ⇒
# bit-identical to the one-level form the DuckDB twin keeps.
# --------------------------------------------------------------------------

_VG_STEP = 50
_VG_SHARD_W = 1 << 13  # buckets per cumsum shard (b ≥ 1 by construction)


def q_vocab_growth(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.length("term") > 0)
    firsts = words.groupBy("term").agg(F.min("doc_id").alias("fd"))
    vb = firsts.groupBy((F.expr(f"fd DIV {_VG_STEP}") + 1).alias("b")).agg(
        F.count("*").alias("new_terms")
    )
    tb = words.groupBy((F.expr(f"doc_id DIV {_VG_STEP}") + 1).alias("b")).agg(
        F.count("*").alias("toks")
    )
    j = vb.join(tb, "b", "full").select(
        "b",
        F.coalesce(F.col("new_terms"), F.lit(0)).alias("nt"),
        F.coalesce(F.col("toks"), F.lit(0)).alias("tk"),
        F.expr(f"b DIV {_VG_SHARD_W}").alias("shard"),
    )
    w1 = Window.partitionBy("shard").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    part = j.select(
        "b", "shard",
        F.sum("nt").over(w1).alias("cv_in"),
        F.sum("tk").over(w1).alias("ct_in"),
    )
    w2 = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        j.groupBy("shard")
        .agg(F.sum("nt").alias("sv"), F.sum("tk").alias("st"))
        .select(
            "shard",
            F.coalesce(F.sum("sv").over(w2), F.lit(0)).alias("ov"),
            F.coalesce(F.sum("st").over(w2), F.lit(0)).alias("ot"),
        )
    )
    out = part.join(F.broadcast(offs), "shard").select(
        (F.col("b") * _VG_STEP).alias("n_docs"),
        (F.col("cv_in") + F.col("ov")).alias("vocab"),
        (F.col("ct_in") + F.col("ot")).alias("tokens"),
    )
    return out.select(
        "n_docs", "vocab", "tokens",
        # guarded: a bucket prefix with zero tokens (all-empty docs) yields
        # NULL type-token ratio instead of DIVIDE_BY_ZERO under ANSI.
        F.expr("CASE WHEN tokens > 0 THEN (vocab * 1000000) DIV tokens END").alias(
            "ttr_q"
        ),
    )


SQL_VOCAB_GROWTH = f"""
WITH words AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
  WHERE length(t.term) > 0
),
firsts AS (SELECT term, min(doc_id) AS fd FROM words GROUP BY 1),
vb AS (SELECT fd // {_VG_STEP} + 1 AS b, count(*) AS new_terms FROM firsts GROUP BY 1),
tb AS (SELECT doc_id // {_VG_STEP} + 1 AS b, count(*) AS toks FROM words GROUP BY 1),
cum AS (
  SELECT coalesce(vb.b, tb.b) AS b,
         CAST(sum(coalesce(new_terms, 0))
              OVER (ORDER BY coalesce(vb.b, tb.b)) AS BIGINT) AS vocab,
         CAST(sum(coalesce(toks, 0))
              OVER (ORDER BY coalesce(vb.b, tb.b)) AS BIGINT) AS tokens
  FROM vb FULL JOIN tb ON vb.b = tb.b
)
SELECT b * {_VG_STEP} AS n_docs, vocab, tokens,
       CASE WHEN tokens > 0 THEN (vocab * 1000000) // tokens END AS ttr_q
FROM cum
"""


# --------------------------------------------------------------------------
# E85 — prefix-filtered similarity join (`ppjoin_pairs`,
# `dedup.ppjoin_pairs`): the EXACT (non-probabilistic) scale path for
# Jaccard dedup — PPJoin's prefix filter generates candidates from the
# rarest ⌈(1−t)|s|⌉+1 shingles per doc only, then a ROW-LOCAL
# array_intersect verify; output identical to `jaccard_pairs` at the
# same threshold (equality pinned in tests/test_dedup_text.py).
# --------------------------------------------------------------------------


def q_ppjoin_pairs(spark, sf_dir):
    return D.ppjoin_pairs(_t(spark, sf_dir, "documents"))


SQL_PPJOIN_PAIRS = D.sql_ppjoin_pairs()


# --------------------------------------------------------------------------
# E93 — MinHash estimator calibration (`minhash_calibration`
# composite): how good is the sketch, measured — for every LSH band
# candidate pair, the signature-agreement ESTIMATE of Jaccard
# (matches·10⁶ DIV 16) side by side with the EXACT shingle-set Jaccard
# (row-local array_intersect on per-doc sorted shingle arrays, the
# ppjoin verify shape) and the signed quantized error.  The
# estimator-quality check every 10⁹-doc dedup tunes bands/rows with.
# --------------------------------------------------------------------------

_bound_mc_cache = make_bounded_cache()


def q_minhash_calibration(spark, sf_dir):
    from gotrackmaster_spark.functions.text import N_MINHASH

    docs = _t(spark, sf_dir, "documents")
    sigs = _bound_mc_cache(D.minhash_signatures(docs))
    cand = D.lsh_candidate_pairs(sigs)
    mh = [f"mh_{j}" for j in range(N_MINHASH)]
    sa = sigs.select(F.col("doc_id").alias("a_id"), *[F.col(c).alias(f"a_{c}") for c in mh])
    sb = sigs.select(F.col("doc_id").alias("b_id"), *[F.col(c).alias(f"b_{c}") for c in mh])
    matches = sum(
        (F.col(f"a_{c}") == F.col(f"b_{c}")).cast("long") for c in mh
    )
    est = cand.join(sa, "a_id").join(sb, "b_id").select(
        "a_id", "b_id", matches.alias("matches")
    )
    sh = D.doc_shingles(docs)
    sets = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle_h")).alias("arr"),
        F.count("*").alias("sz"),
    )
    j = (
        est.join(sets.select(F.col("doc_id").alias("a_id"), F.col("arr").alias("la"),
                             F.col("sz").alias("sa")), "a_id")
        .join(sets.select(F.col("doc_id").alias("b_id"), F.col("arr").alias("lb"),
                          F.col("sz").alias("sb")), "b_id")
        .withColumn("inter", F.size(F.array_intersect(F.col("la"), F.col("lb"))).cast("long"))
    )
    est_q = F.expr(f"(matches * 1000000) DIV {N_MINHASH}")
    jac_q = F.expr("(inter * 1000000) DIV (sa + sb - inter)")
    return j.select(
        "a_id", "b_id", "matches", "inter", "sa", "sb",
        est_q.alias("est_q"), jac_q.alias("jac_q"),
        (est_q - jac_q).alias("err_q"),
    )


def _sql_minhash_calibration() -> str:
    from gotrackmaster_spark.functions.text import N_MINHASH

    match_sum = " + ".join(
        f"(CASE WHEN a.mh_{j} = b.mh_{j} THEN 1 ELSE 0 END)"
        for j in range(N_MINHASH)
    )
    return f"""
WITH cand AS ({D.sql_minhash_band_pairs()}),
{D._SHINGLES_CTE.strip().rstrip()},
{D._sql_minhash_cte()},
sets AS (
  SELECT doc_id, list_sort(list(shingle_h)) AS arr,
         CAST(count(*) AS BIGINT) AS sz
  FROM shingles GROUP BY 1
),
est AS (
  SELECT c.a_id, c.b_id, CAST({match_sum} AS BIGINT) AS matches
  FROM cand c
  JOIN minhash a ON a.doc_id = c.a_id
  JOIN minhash b ON b.doc_id = c.b_id
)
SELECT e.a_id, e.b_id, e.matches,
       CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT) AS inter,
       sa.sz AS sa, sb.sz AS sb,
       (e.matches * 1000000) // {N_MINHASH} AS est_q,
       (CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT) * 1000000)
       // (sa.sz + sb.sz - CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT)) AS jac_q,
       (e.matches * 1000000) // {N_MINHASH}
       - (CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT) * 1000000)
         // (sa.sz + sb.sz - CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT)) AS err_q
FROM est e
JOIN sets sa ON sa.doc_id = e.a_id
JOIN sets sb ON sb.doc_id = e.b_id
"""


SQL_MINHASH_CALIBRATION = _sql_minhash_calibration()


__all__ = [
    "q_geo_text_search",
    "_sql_geo_text_search",
    "SQL_GEO_TEXT_SEARCH",
    "q_token_stats",
    "SQL_TOKEN_STATS",
    "_fp_col",
    "_fp_sql",
    "q_doc_fingerprints",
    "SQL_DOC_FINGERPRINTS",
    "bpe_token_count_col",
    "bpe_token_count_sql",
    "lang_pred_col",
    "lang_pred_sql",
    "quality_score_col",
    "quality_score_sql",
    "_JACCARD_NUM",
    "_JACCARD_DEN",
    "q_jaccard_pairs",
    "SQL_JACCARD_PAIRS",
    "q_minhash_band_pairs",
    "SQL_MINHASH_BAND_PAIRS",
    "q_lang_quality",
    "SQL_LANG_QUALITY",
    "q_repetition_stats",
    "SQL_REPETITION_STATS",
    "q_heavy_hitters",
    "SQL_HEAVY_HITTERS",
    "_LM_V",
    "q_lm_scores",
    "SQL_LM_SCORES",
    "_DECON_MOD",
    "q_decontamination",
    "_sql_decon",
    "SQL_DECONTAMINATION",
    "q_doc_chunks",
    "q_seq_packing",
    "_sql_chunks",
    "_sql_pack",
    "SQL_DOC_CHUNKS",
    "SQL_SEQ_PACKING",
    "_TTT_K",
    "_TTT_QUANT",
    "_TTT_TILE_DEG",
    "q_tile_top_terms",
    "SQL_TILE_TOP_TERMS",
    "_DELTA_NEW_MOD",
    "_DELTA_NEW_REM",
    "_delta_docs",
    "q_delta_dedup",
    "q_ngram_novelty",
    "_sql_delta_flag",
    "_sql_delta_dedup",
    "_sql_ngram_novelty",
    "SQL_DELTA_DEDUP",
    "SQL_NGRAM_NOVELTY",
    "_PMI_QUANT",
    "_PMI_MIN_PAIRS",
    "q_term_pmi",
    "_sql_term_pmi",
    "SQL_TERM_PMI",
    "q_winnow_pairs",
    "SQL_WINNOW_PAIRS",
    "SQL_BM25_SCORES",
    "q_canonical_docs",
    "SQL_CANONICAL_DOCS",
    "q_winnow_verified",
    "SQL_WINNOW_VERIFIED",
    "_PHRASES",
    "q_phrase_search",
    "SQL_PHRASE_SEARCH",
    "_sql_phrase_search",
    "_VG_STEP",
    "_VG_SHARD_W",
    "q_vocab_growth",
    "SQL_VOCAB_GROWTH",
    "q_ppjoin_pairs",
    "SQL_PPJOIN_PAIRS",
    "_bound_mc_cache",
    "q_minhash_calibration",
    "_sql_minhash_calibration",
    "SQL_MINHASH_CALIBRATION",
]
