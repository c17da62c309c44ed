"""Deterministic Common-Crawl-style corpus synthesizer.

Generates the engine's input table per BASELINE.json:input_hint —
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)`` — entirely with Catalyst expressions over
``spark.range``: no Python in the generator, no RNG state, no
wall-clock. Row content is a pure function of (row id, seed), so the
same (n, seed) produces byte-identical rows at ANY parallelism —
required for the local[8]-vs-local[32] scaling benchmark and for
checkpoint-resume fingerprints.

The vocabulary is zipfian-ish (a head of stopwords + a long tail), so
head-term skew (SURVEY §4.3 salting) is actually exercised.

``html`` deterministically wraps ``text`` so the extraction UDF
(text/extract.py) is byte-identical per url — the per-row invariant
the input_hint mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Head of the zipf distribution: real stopwords → shared char-grams →
# genuine posting-list skew.
_HEAD_WORDS = [
    "the", "of", "and", "to", "in", "that", "is", "was", "for", "with",
    "as", "on", "his", "they", "be", "at", "one", "have", "this", "from",
    "or", "had", "by", "word", "but", "what", "some", "were", "there",
    "page", "home", "search", "about", "contact", "news", "world",
    "sports", "cinema", "food", "music", "science", "health", "travel",
]


def _u01(*cols) -> str:
    """SQL: uniform [0,1) from xxhash64 of the given SQL fragments."""
    args = ", ".join(str(c) for c in cols)
    return f"(abs(xxhash64({args})) % 1000000000) / 1000000000.0"


def synth_webtext(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab_size: int = 20000,
    min_words: int = 30,
    max_words: int = 200,
    zipf_alpha: float = 3.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthesize ``n_docs`` web pages. Pure Catalyst, deterministic."""
    n_head = len(_HEAD_WORDS)
    head_arr = "array(" + ", ".join(f"'{w}'" for w in _HEAD_WORDS) + ")"
    # zipf-ish index: u^alpha concentrates mass near 0 (the head)
    word_expr = (
        f"transform(sequence(0, n_words - 1), k -> "
        f"  CASE WHEN vi(k) < {n_head} THEN element_at({head_arr}, vi(k) + 1) "
        f"       ELSE concat('term', vi(k)) END)"
    )
    # vi(k): per-position vocabulary index
    vi = (
        f"cast(floor(pow({_u01('id', 'k', seed)}, {zipf_alpha}) "
        f"* {vocab_size}) as int)"
    )
    word_expr = word_expr.replace("vi(k)", vi)

    rng = spark.range(0, n_docs, 1, num_partitions) if num_partitions else spark.range(n_docs)
    df = (
        rng.withColumn(
            "n_words",
            F.expr(
                f"{min_words} + cast(abs(xxhash64(id, 'len', {seed})) "
                f"% {max_words - min_words + 1} as int)"
            ),
        )
        .withColumn("text", F.expr(f"array_join({word_expr}, ' ')"))
        .withColumn(
            "url",
            F.expr("concat('https://site', id % 997, '.example/p/', id)"),
        )
        .withColumn(
            "warc_ts",
            F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 31536000)"),
        )
        .withColumn(
            "lang",
            F.expr(
                f"element_at(array('en','en','en','en','en','en','fr','de','es','zh'), "
                f"1 + cast(abs(xxhash64(id, 'lang', {seed})) % 10 as int))"
            ),
        )
        .withColumn(
            "html",
            F.expr(
                "cast(concat('<html><body><p>', text, '</p></body></html>') as binary)"
            ),
        )
    )
    return df.select("url", "warc_ts", "html", "text", "lang")


def synth_queries(
    spark: SparkSession, n_queries: int, seed: int = 7, words_per_query: int = 3
) -> DataFrame:
    """(query_id, query) — queries drawn from the same zipfian vocab."""
    n_head = len(_HEAD_WORDS)
    head_arr = "array(" + ", ".join(f"'{w}'" for w in _HEAD_WORDS) + ")"
    vi = f"cast(floor(pow({_u01('id', 'k', seed)}, 2.0) * 2000) as int)"
    word_expr = (
        f"transform(sequence(0, {words_per_query - 1}), k -> "
        f"  CASE WHEN {vi} < {n_head} THEN element_at({head_arr}, {vi} + 1) "
        f"       ELSE concat('term', {vi}) END)"
    )
    return (
        spark.range(n_queries)
        .select(
            F.col("id").alias("query_id"),
            F.expr(f"array_join({word_expr}, ' ')").alias("query"),
        )
    )
