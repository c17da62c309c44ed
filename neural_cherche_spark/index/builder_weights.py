"""BM25 weight computation against a prebuilt termdict (builder stage).

Split from index/build.py so the builder can reuse the already-
aggregated tf/dl/termdict DataFrames without recomputing them — at
scale every recomputation is a full corpus re-tokenize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neural_cherche_spark.index.build import BM25Config


def weights_from_tf(
    tf: DataFrame,
    dl: DataFrame,
    termdict: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: BM25Config,
) -> DataFrame:
    """(term_id, doc_id, w, n_salts) normalized BM25 weights.

    Same math as index.build.bm25_weights (SURVEY §2.9 steps 1-5) but
    idf comes from the termdict table and n_docs/avgdl are literals
    (already-collected scalars), saving two aggregations.
    """
    w2 = (
        tf.join(dl, "doc_id")
        .join(termdict.select("term", "term_id", "idf", "n_salts"), "term")
        .withColumn(
            "w2",
            (
                F.col("tf")
                * (cfg.k1 + 1.0)
                / (
                    F.col("tf")
                    + cfg.k1 * (1.0 - cfg.b + cfg.b * F.col("dl") / F.lit(avgdl))
                )
                + F.lit(cfg.epsilon)
            )
            * F.col("idf"),
        )
        .select("term_id", "doc_id", "w2", "n_salts")
    )
    norms = w2.groupBy("term_id").agg(
        F.sqrt(F.sum(F.col("w2") * F.col("w2"))).alias("term_norm")
    )
    return (
        w2.join(norms, "term_id")
        .withColumn("w", F.col("w2") / F.col("term_norm"))
        .select("term_id", "doc_id", "w", "n_salts")
    )
