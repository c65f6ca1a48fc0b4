"""Text-analysis operators over a documents table — language id, quality
scoring, token counting, fingerprinting (training-data pipeline ops).

These are deliberately expressed with built-in ``pyspark.sql.functions``
only (JVM-side, whole-stage codegen, no Python in the hot path) using a
simple ``[a-z0-9]+`` analyzer, so each has an exact ANSI-SQL twin that
DuckDB can run for the correctness gate. The murmur-hash engine analyzer
lives in word2doc_spark.functions.tokenize and is verified separately
against the numpy oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from word2doc_spark.functions.stopwords import (
    DE_STOPWORDS, FR_STOPWORDS, STOPWORDS,
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def spread_input(df: DataFrame) -> DataFrame:
    """Fan a low-parallelism input out to the session's shuffle width
    BEFORE expensive per-row work: a small corpus parquet reads as a
    handful of scan tasks (one 20 MB file = ONE task at the default
    128 MB split), which serializes interpreted higher-order-function
    projections / per-row hashing onto as many cores. A big input (scan
    tasks ≥ shuffle partitions) passes through untouched — at
    production scale this repartition never fires."""
    sp = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() < sp:
        return df.repartition(sp)
    return df


def sql_tokens(col: str | Column = "text") -> Column:
    """array<string> of lowercase alnum tokens; twin of DuckDB
    ``list_filter(string_split_regex(lower(x),'[^a-z0-9]+'), t -> t<>'')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def exploded_tokens(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, pos, token) — ordered exploded tokens."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(sql_tokens(text_col)).alias("pos", "token"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_chars)."""
    toks = sql_tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length("text").cast("long").alias("n_chars"),
    )


def _ratio_in(set_words: frozenset, toks: Column) -> Column:
    arr = F.array(*[F.lit(w) for w in sorted(set_words)])
    hits = F.size(F.array_intersect(F.array_distinct(toks), arr))
    return hits.cast("double") / F.greatest(
        F.size(F.array_distinct(toks)), F.lit(1)).cast("double")


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_guess) — distinct-stopword-hit-ratio argmax over
    {en, de, fr}; 'und' (undetermined) when no list hits."""
    toks = sql_tokens("text")
    en = _ratio_in(STOPWORDS, toks)
    de = _ratio_in(DE_STOPWORDS, toks)
    fr = _ratio_in(FR_STOPWORDS, toks)
    best = F.greatest(en, de, fr)
    guess = (F.when(best <= F.lit(0.0), F.lit("und"))
              .when(en == best, F.lit("en"))
              .when(de == best, F.lit("de"))
              .otherwise(F.lit("fr")))
    return docs.select("doc_id", guess.alias("lang_guess"))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stopword_ratio, mean_token_len, quality) —
    length/stopword heuristics a pretraining pipeline filters on.
    The stopword filter + length fold are interpreted HOF lambdas (the
    heaviest per-row projection in this module) — spread a
    few-scan-task input first so they parallelize."""
    docs = spread_input(docs.select("doc_id", "text"))
    toks = sql_tokens("text")
    n = F.size(toks)
    sw_arr = F.array(*[F.lit(w) for w in sorted(STOPWORDS)])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
    swr = n_sw.cast("double") / F.greatest(n, F.lit(1)).cast("double")
    tot_len = F.aggregate(toks, F.lit(0),
                          lambda acc, t: acc + F.length(t))
    mtl = tot_len.cast("double") / F.greatest(n, F.lit(1)).cast("double")
    quality = (
        F.when(n < 5, F.lit(0.0))
        .otherwise(
            F.least(F.lit(1.0), n.cast("double") / F.lit(100.0)) * 0.4
            + F.when((swr >= 0.05) & (swr <= 0.6), F.lit(0.4)).otherwise(F.lit(0.0))
            + F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(0.2)).otherwise(F.lit(0.0))
        )
    )
    return docs.select(
        "doc_id", n.cast("long").alias("n_tokens"),
        F.round(swr, 6).alias("stopword_ratio"),
        F.round(mtl, 6).alias("mean_token_len"),
        F.round(quality, 6).alias("quality"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — md5 of the space-joined normalized token stream;
    canonical content fingerprint for exact dedup across formatting."""
    toks = sql_tokens("text")
    return docs.select(
        "doc_id",
        F.md5(F.array_join(toks, " ")).alias("fp"),
    )


def sanitize_titles(df: DataFrame, col: str = "title",
                    out: str = "clean_title") -> DataFrame:
    """B5/C15 title sanitizer (reference
    /root/reference/src/word2doc/optimizer/pre_process.py:212-218,279):
    lowercase, keep only alphanumeric characters and spaces (unicode
    alnum, matching Python str.isalnum), drop rows whose cleaned title is
    empty. Pure column ops with an exact SQL twin."""
    cleaned = F.regexp_replace(F.lower(F.col(col)), r"[^\p{L}\p{N} ]", "")
    return (df.withColumn(out, cleaned)
              .filter(F.col(out) != ""))


# GPT-style pre-tokenizer approximation (letters runs | digit runs |
# single punctuation) — ASCII classes so Java and RE2 regex agree and
# DuckDB can run an exact twin
BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_ish_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_pieces, n_words, pieces_per_word) — training-cost
    estimation counts: whitespace-delimited words plus a BPE-ish
    pre-token count (the per-doc token budget proxy used when the real
    tokenizer is too expensive to run corpus-wide). Pure built-ins,
    whole-stage codegen."""
    # pattern passed as a literal Column — routing it through F.expr would
    # subject the backslash in \s to SQL string-escape processing
    pieces = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_RE), F.lit(0))
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    n_pieces = F.coalesce(F.size(pieces), F.lit(0)).cast("long")
    n_words = F.coalesce(F.size(words), F.lit(0)).cast("long")
    return docs.select(
        "doc_id",
        n_pieces.alias("n_pieces"),
        n_words.alias("n_words"),
        F.round(n_pieces.cast("double")
                / F.greatest(n_words, F.lit(1)).cast("double"), 6)
         .alias("pieces_per_word"),
    )
