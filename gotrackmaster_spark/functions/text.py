"""Text-analysis primitives for the training-data pipeline: tokenization,
language ID, quality scoring, fingerprinting, shingling, minhash/simhash.

Every function here exists twice with IDENTICAL integer/float semantics: a
pyspark Column/expr builder and a DuckDB SQL-string builder, so the
driver's oracle can replay the exact computation.  All hashing is explicit
modular arithmetic (no engine-native hash functions — those differ between
engines); int64 overflow is avoided by keeping every product < 2^63.

Hash scheme: ``h0(s) = Σ_i code(s_i) · w(i) mod P`` with
``w(i) = (i · 2654435761) mod 100000007`` and ``P = 1000000007``;
minhash_j applies the affine family ``(a_j·h0 + b_j) mod P``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1000000007
W = 100000007
A_MULT = 2654435761

N_MINHASH = 16
LSH_BANDS = 4  # 4 bands × 4 rows

# deterministic affine family (a_j odd-ish, b_j spread)
MINHASH_AB = [((j * 40503 + 13) % P, (j * 2654435761 + 101) % P) for j in range(1, N_MINHASH + 1)]

SHINGLE_K = 5  # word 5-grams

# stopword markers per language for the n-gram language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "fr": ["le", "et", "des"],
    "de": ["der", "und", "das"],
    "zh": ["zh", "shi", "de"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in"]


# ------------------------------------------------------------- fingerprint ---

def h0_col(text_expr: str) -> Column:
    """Position-weighted codepoint hash of a string expression (Spark)."""
    return F.expr(h0_spark_expr(text_expr))


def h0_spark_expr(text_expr: str) -> str:
    return (
        f"aggregate(transform(sequence(1, length({text_expr})), i -> "
        f"CAST(ascii(substring({text_expr}, i, 1)) AS BIGINT) * ((i * {A_MULT}) % {W})), "
        f"CAST(0 AS BIGINT), (acc, v) -> (acc + v) % {P})"
    )


def h0_sql(text_expr: str) -> str:
    return (
        # CAST the final value: DuckDB list_sum over BIGINT yields HUGEINT,
        # which hash-mismatches Spark's BIGINT even when values are equal.
        f"CAST(list_sum(list_transform(generate_series(1, length({text_expr})), i -> "
        f"CAST(unicode(substr({text_expr}, i, 1)) AS BIGINT) * ((i * {A_MULT}) % {W}))) % {P}"
        f" AS BIGINT)"
    )


# --------------------------------------------------------------- tokenizing ---

def n_tokens_col(text: str) -> Column:
    """Whitespace token count via the replace-length trick (single-space
    separated corpus); exact integer, engine-portable."""
    return F.length(text) - F.length(F.regexp_replace(text, " ", "")) + 1


def n_tokens_sql(text: str) -> str:
    return f"(length({text}) - length(replace({text}, ' ', '')) + 1)"


def bpe_token_count_col(text: str) -> Column:
    """BPE-ish token count: runs of letters, runs of digits, single other
    non-space chars."""
    return F.regexp_count(F.col(text), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))


def bpe_token_count_sql(text: str) -> str:
    return f"len(regexp_extract_all({text}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))"


# ----------------------------------------------------------------- shingles ---

def shingles_spark_expr(text_expr: str, k: int = SHINGLE_K) -> str:
    """DISTINCT word k-gram shingle strings (Spark SQL expression)."""
    toks = f"split({text_expr}, ' ')"
    # NB: Spark sequence(1, 0) yields the DESCENDING [1, 0] — guard short texts
    return (
        f"CASE WHEN size({toks}) < {k} THEN array() ELSE "
        f"array_distinct(transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {k})))) END"
    )


def shingles_sql(text_expr: str, k: int = SHINGLE_K) -> str:
    toks = f"string_split({text_expr}, ' ')"
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({toks}) - {k - 1}, 0)), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], ' ')))"
    )


# ---------------------------------------------------------------- lang / QA ---

def _count_word_col(text: str, word: str) -> Column:
    padded = F.concat(F.lit(" "), F.col(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded, F.lit(needle), F.lit(" "))))
        / (len(needle) - 1)
    ).cast("long")


def _count_word_sql(text: str, word: str) -> str:
    padded = f"(' ' || {text} || ' ')"
    needle = f" {word} "
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{needle}', ' '))) "
        f"/ {len(needle) - 1} AS BIGINT)"
    )


def lang_pred_col(text: str) -> Column:
    """argmax over LANG_MARKERS of marker-word counts; ties → lexicographic
    smallest lang (deterministic)."""
    best = None
    for lang in sorted(LANG_MARKERS):
        score = sum(
            (_count_word_col(text, wrd) for wrd in LANG_MARKERS[lang]),
            F.lit(0).cast("long"),
        )
        pair = F.struct(score.alias("s"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(
            (pair["s"] > best["s"]), pair
        ).otherwise(best)
    return best["lang"]


def lang_pred_sql(text: str) -> str:
    # replicate the same fold: later langs (sorted) win only on strictly
    # greater score
    expr = None
    for lang in sorted(LANG_MARKERS):
        score = " + ".join(_count_word_sql(text, wrd) for wrd in LANG_MARKERS[lang])
        pair = f"struct_pack(s := ({score}), lang := '{lang}')"
        if expr is None:
            expr = pair
        else:
            expr = f"(CASE WHEN ({pair}).s > ({expr}).s THEN {pair} ELSE ({expr}) END)"
    return f"({expr}).lang"


def quality_score_col(text: str) -> Column:
    """Deterministic quality score in [0, 1]: length term (0.4) +
    stopword-ratio term (0.3) + alpha-ratio term (0.3).

    Computed ENTIRELY in exact integer arithmetic (parts-per-million with
    floored divisions; operand magnitudes ≤ 1.5e8 make double-division +
    truncation equal to integer floor division) and converted to double by
    one exact division — engines cannot disagree in the last ULP, so no
    rounding guard is needed (a float formulation once landed exactly on a
    .xxxxx5 rounding boundary and flipped between engines)."""
    toks = n_tokens_col(text).cast("long")
    stops = sum(
        (_count_word_col(text, wrd) for wrd in STOPWORDS), F.lit(0).cast("long")
    )
    alpha_len = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("long")
    text_len = F.length(text).cast("long")

    def idiv(a: Column, b: Column) -> Column:
        # exact for positive operands far below 2^52
        return (a / b).cast("long")

    term1 = F.lit(4000) * F.least(toks, F.lit(100).cast("long"))
    term2 = F.least(F.lit(300000).cast("long"), idiv(F.lit(1500000) * stops, toks))
    term3 = idiv(F.lit(300000) * alpha_len, text_len)
    return (term1 + term2 + term3).cast("double") / 1000000.0


def quality_score_sql(text: str) -> str:
    toks = f"CAST({n_tokens_sql(text)} AS BIGINT)"
    stops = "(" + " + ".join(_count_word_sql(text, wrd) for wrd in STOPWORDS) + ")"
    alpha_len = f"CAST(length(regexp_replace({text}, '[^A-Za-z]', '', 'g')) AS BIGINT)"
    text_len = f"CAST(length({text}) AS BIGINT)"
    return (
        f"CAST(4000 * least({toks}, 100) "
        f"+ least(300000, (1500000 * {stops}) // {toks}) "
        f"+ (300000 * {alpha_len}) // {text_len} AS DOUBLE) / 1000000.0"
    )
