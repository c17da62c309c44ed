"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over sf0.001 documents.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2, each checked against a DuckDB oracle at sf0.01.

Both sides tokenize identically (lowercase + in-word char 3-5-grams,
reference retrieve/bm25.py:131-137 semantics) and round floating
outputs to 6 dp AFTER ranking on the rounded value, so the
order-insensitive value-hash comparison is deterministic across
engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shared fixtures: the literal query workload (words drawn from the
# driver testdata vocabulary), embedded identically in Spark + SQL.
# ---------------------------------------------------------------------------
QUERY_SET: list[tuple[int, str]] = [
    # 'dup' is the only rare word in the driver corpus → positive idf →
    # real ranked results (reference idf goes negative for any term with
    # tf_total > N, bm25.py:185-190, and scores ≤ 0 are dropped).
    (0, "dup"),
    (1, "dup merge batch"),
    (2, "dup window value stream"),
    (3, "hash join table"),  # all head terms → negative idf → empty
    (4, "slow row key part"),  # likewise
    (5, "zzzzqqq"),  # zero-overlap → must return nothing (SURVEY T1 note)
]

K1, B, EPS = 1.5, 0.75, 0.0  # reference defaults (bm25.py:118-143)
TOP_K = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(QUERY_SET, "query_id long, query string")


# ---------------------------------------------------------------------------
# DuckDB oracle SQL building blocks
# ---------------------------------------------------------------------------
# char_wb 3-5 n-gram tokenizer over `documents` (same semantics as
# neural_cherche_spark.text.ngrams, SURVEY §2.2 P2+P3)
_TOK_DOCS = r"""
words AS (
  SELECT doc_id, w FROM documents,
  LATERAL unnest(regexp_split_to_array(lower(text), '\s+')) AS t(w)
  WHERE length(w) >= 3
),
grams AS (
  SELECT doc_id, substring(w, s::INT, n::INT) AS term
  FROM words
  JOIN LATERAL (SELECT unnest(range(3,6)) AS n) tn ON length(w) >= n
  JOIN LATERAL (SELECT unnest(range(1, length(w)-n+2)) AS s) ts ON TRUE
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM grams GROUP BY 1, 2)
"""

_QUERY_VALUES = ", ".join(f"({i}, '{q}')" for i, q in QUERY_SET)

_TOK_QUERIES = rf"""
qtab(query_id, query) AS (VALUES {_QUERY_VALUES}),
qwords AS (
  SELECT query_id, w FROM qtab,
  LATERAL unnest(regexp_split_to_array(lower(query), '\s+')) AS t(w)
  WHERE length(w) >= 3
),
qgrams AS (
  SELECT query_id, substring(w, s::INT, n::INT) AS term
  FROM qwords
  JOIN LATERAL (SELECT unnest(range(3,6)) AS n) tn ON length(w) >= n
  JOIN LATERAL (SELECT unnest(range(1, length(w)-n+2)) AS s) ts ON TRUE
),
qtf AS (SELECT query_id, term, count(*) AS qtf FROM qgrams GROUP BY 1, 2)
"""

# BM25 weight pipeline (SURVEY §2.9 steps 1-5) as SQL CTEs
_BM25_WEIGHTS = rf"""
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
cstats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl),
tstats AS (SELECT term, CAST(sum(tf) AS BIGINT) AS tf_total,
                  CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
w2 AS (
  SELECT tf.doc_id, tf.term,
         (tf.tf * ({K1} + 1.0) / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / cstats.avgdl)) + {EPS})
         * ln((cstats.n_docs - tstats.tf_total + 0.5) / (tstats.tf_total + 0.5) + 1.0) AS w2
  FROM tf
  JOIN dl USING (doc_id)
  JOIN tstats USING (term)
  CROSS JOIN cstats
),
tnorm AS (SELECT term, sqrt(sum(w2 * w2)) AS term_norm FROM w2 GROUP BY 1),
weights AS (
  SELECT w2.doc_id, w2.term, w2.w2 / tnorm.term_norm AS w
  FROM w2 JOIN tnorm USING (term)
)
"""


# ---------------------------------------------------------------------------
# Spark-side query implementations
# ---------------------------------------------------------------------------
def _q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neural_cherche_spark.index import term_frequencies

    return term_frequencies(_docs(spark, sf_dir)).select(
        "doc_id", "term", F.col("tf").cast("long").alias("tf")
    )


def _q_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neural_cherche_spark.index import doc_lengths, term_frequencies

    return doc_lengths(term_frequencies(_docs(spark, sf_dir))).select(
        "doc_id", F.col("dl").cast("long").alias("dl")
    )


def _q_collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neural_cherche_spark.index import (
        collection_stats,
        doc_lengths,
        term_frequencies,
    )

    return collection_stats(
        doc_lengths(term_frequencies(_docs(spark, sf_dir)))
    ).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("avgdl", 6).alias("avgdl"),
    )


def _q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neural_cherche_spark.index import (
        doc_lengths,
        term_frequencies,
        term_stats,
    )

    tf = term_frequencies(_docs(spark, sf_dir))
    n_docs = doc_lengths(tf).agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        term_stats(tf)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.col("tf_total").cast("long").alias("tf_total"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("tf_total") + 0.5)
                    / (F.col("tf_total") + 0.5)
                    + 1.0
                ),
                6,
            ).alias("idf"),
        )
    )


def _q_bm25_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neural_cherche_spark.index import bm25_weights

    return bm25_weights(_docs(spark, sf_dir)).select(
        "doc_id", "term", F.round("w", 6).alias("w")
    )


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neural_cherche_spark.index import bm25_weights
    from neural_cherche_spark.query import query_term_counts
    from pyspark.sql import Window

    w = bm25_weights(_docs(spark, sf_dir))
    qt = query_term_counts(_queries_df(spark))
    scored = (
        w.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("qtf") * F.col("w")), 6).alias("score"))
        .filter(F.col("score") > 0)
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "doc_id", "score", "rank")
    )


def _q_field_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P1: multi-field concat with missing→'' semantics."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            " ", F.coalesce(F.col("source"), F.lit("")), F.coalesce(F.col("text"), F.lit(""))
        ).alias("joined"),
    )


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k retrieval over sf0.001 documents."""
    return _q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_frequencies": _q_term_frequencies,
        "doc_length": _q_doc_length,
        "collection_stats": _q_collection_stats,
        "term_stats": _q_term_stats,
        "bm25_weights": _q_bm25_weights,
        "bm25_topk": _q_bm25_topk,
        "field_concat": _q_field_concat,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "term_frequencies": f"""
            WITH {_TOK_DOCS}
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf FROM tf
        """,
        "doc_length": f"""
            WITH {_TOK_DOCS}
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
        """,
        "collection_stats": f"""
            WITH {_TOK_DOCS},
            dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(dl), 6) AS avgdl
            FROM dl
        """,
        "term_stats": f"""
            WITH {_TOK_DOCS},
            nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf)
            SELECT term,
                   CAST(sum(tf) AS BIGINT) AS tf_total,
                   CAST(count(*) AS BIGINT) AS df,
                   round(ln((nd.n_docs - sum(tf) + 0.5) / (sum(tf) + 0.5) + 1.0), 6) AS idf
            FROM tf CROSS JOIN nd
            GROUP BY term, nd.n_docs
        """,
        "bm25_weights": f"""
            WITH {_TOK_DOCS}, {_BM25_WEIGHTS}
            SELECT doc_id, term, round(w, 6) AS w FROM weights
        """,
        "bm25_topk": f"""
            WITH {_TOK_DOCS}, {_BM25_WEIGHTS}, {_TOK_QUERIES},
            scored AS (
              SELECT qtf.query_id, weights.doc_id,
                     round(sum(qtf.qtf * weights.w), 6) AS score
              FROM qtf JOIN weights USING (term)
              GROUP BY 1, 2
              HAVING round(sum(qtf.qtf * weights.w), 6) > 0
            ),
            ranked AS (
              SELECT query_id, doc_id, score,
                     CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, doc_id ASC
                     ) AS BIGINT) AS rank
              FROM scored
            )
            SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= {TOP_K}
        """,
        "field_concat": """
            SELECT doc_id,
                   concat(coalesce(source, ''), ' ', coalesce(text, '')) AS joined
            FROM documents
        """,
    }
