"""BM25 weight computation against a prebuilt termdict (builder stage).

Split from index/build.py so the builder can reuse the already-
aggregated tf/dl/termdict DataFrames without recomputing them — at
scale every recomputation is a full corpus re-tokenize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neural_cherche_spark.index.build import BM25Config


def tfidf_weights_from_tf(
    tf: DataFrame,
    termdict: DataFrame,
    broadcast_termdict: bool = True,
) -> DataFrame:
    """(term_id, doc_id, w, n_salts) L2-per-DOC-normalized smoothed
    tf-idf weights (reference ``retrieve.TfIdf`` semantics,
    index/build.py::tfidf_weights) against a prebuilt termdict whose
    ``idf`` column holds ln((1+N)/(1+df)) + 1.

    Plan: tf ⋈ broadcast(termdict) → per-doc norm via groupBy(doc_id)
    + join (one doc-keyed shuffle; window-free). All weights are
    non-negative, so the block-max query path prunes at full strength
    on a tfidf-weighted index.
    """
    td = termdict.select("term", "term_id", "idf", "n_salts")
    if broadcast_termdict:
        td = F.broadcast(td)
    w_raw = tf.join(td, "term").withColumn(
        "w_raw", F.col("tf") * F.col("idf")
    )
    doc_norm = w_raw.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw"))).alias("doc_norm")
    )
    return (
        w_raw.join(doc_norm, "doc_id")
        # float32 BEFORE the encode shuffle: the codec stores float32
        # anyway and IEEE double→float rounding is identical on both
        # sides, so this halves the weight column's shuffle bytes for
        # free (guide §2.3 "narrower types")
        .withColumn(
            "w", (F.col("w_raw") / F.col("doc_norm")).cast("float")
        )
        .select("term_id", "doc_id", "w", "n_salts")
    )


def weights_from_tf(
    tf: DataFrame,
    dl: DataFrame,
    termdict: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: BM25Config,
    broadcast_termdict: bool = True,
) -> DataFrame:
    """(term_id, doc_id, w, n_salts) normalized BM25 weights.

    Same math as index.build.bm25_weights (SURVEY §2.9 steps 1-5) but
    idf AND the per-term L2 norm come from the termdict table
    (computed once in the termdict stage), so this plan touches the
    full posting set exactly once: tf ⋈ dl (doc-keyed) ⋈
    broadcast(termdict) → project. No term-keyed shuffle of postings.

    ``broadcast_termdict=False`` for vocabularies too large to
    broadcast (>~a few 10^7 terms): falls back to a shuffle join that
    AQE plans with skew handling.
    """
    td = termdict.select("term", "term_id", "idf", "term_norm", "n_salts")
    if broadcast_termdict:
        td = F.broadcast(td)
    return (
        tf.join(dl, "doc_id")
        .join(td, "term")
        # float32 before the encode shuffle — identical stored values
        # (the codec's .astype(np.float32) was the rounding point
        # anyway; IEEE round-to-nearest either side), half the weight
        # bytes through the exchange (guide §2.3 "narrower types")
        .withColumn(
            "w",
            (
                (
                    F.col("tf")
                    * (cfg.k1 + 1.0)
                    / (
                        F.col("tf")
                        + cfg.k1
                        * (1.0 - cfg.b + cfg.b * F.col("dl") / F.lit(avgdl))
                    )
                    + F.lit(cfg.epsilon)
                )
                * F.col("idf")
                / F.col("term_norm")
            ).cast("float"),
        )
        .select("term_id", "doc_id", "w", "n_salts")
    )
