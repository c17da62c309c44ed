"""IR evaluation metrics as Spark SQL aggregations.

Re-expresses the reference's ranx-based evaluation
(utils/evaluate.py:198-223, SURVEY §2.3 A8) — map@k, ndcg@k, hits@k,
recall@k over a (run ⋈ qrels) join. The reference feeds ranx a
rank-normalized score ``1 - rank/len`` (evaluate.py:205-211); rank
order is what matters, and here ranks come in directly.

All metrics are standard (binary-relevance forms for map/recall/hits,
graded for ndcg), computed per query then macro-averaged over the
queries that HAVE qrels — ranx behavior.

Scale: one broadcast-able join (qrels are tiny), two groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_run(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Macro-averaged metrics.

    run:   (query_id, doc_id, rank) — rank 1-based, unique per query
    qrels: (query_id, doc_id, relevance>0)
    returns one row: (k, n_queries, hits, recall, map, ndcg)
    """
    from pyspark.sql import Window

    qrels = qrels.filter(F.col("relevance") > 0)
    n_rel = qrels.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))

    # join hits within top-k; hit_index = how many hits at rank ≤ r
    hits = (
        run.filter(F.col("rank") <= k)
        .join(qrels, ["query_id", "doc_id"])
        .withColumn(
            "hit_index",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("rank")
            ),
        )
        .select("query_id", "rank", "relevance", "hit_index")
    )

    per_q_hits = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        # DCG with graded relevance: sum rel / log2(rank+1)
        F.sum(F.col("relevance") / F.log2(F.col("rank") + 1.0)).alias("dcg"),
        # AP numerator: sum over hits of precision@rank = hit_index/rank
        F.sum(F.col("hit_index") / F.col("rank")).alias("ap_num"),
    )

    # ideal DCG per query (binary/graded from qrels)
    idcg = (
        qrels.groupBy("query_id")
        .agg(F.sort_array(F.collect_list("relevance"), asc=False).alias("rels"))
        .select(
            "query_id",
            F.expr(
                f"""aggregate(
                      zip_with(slice(rels, 1, {k}),
                               sequence(1, least(size(rels), {k})),
                               (r, i) -> r / log2(i + 1.0)),
                      CAST(0.0 AS DOUBLE), (a, x) -> a + x)"""
            ).alias("idcg"),
        )
    )

    per_q = (
        n_rel.join(per_q_hits, "query_id", "left")
        .join(idcg, "query_id", "left")
        .na.fill({"n_hits": 0, "dcg": 0.0, "ap_num": 0.0})
        .select(
            "query_id",
            (F.col("n_hits") > 0).cast("double").alias("hit"),
            (F.col("n_hits") / F.col("n_rel")).alias("recall"),
            (F.col("ap_num") / F.least(F.col("n_rel"), F.lit(k))).alias("ap"),
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
            .otherwise(0.0)
            .alias("ndcg"),
        )
    )
    return per_q.agg(
        F.lit(k).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("hit"), 6).alias("hits"),
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("ap"), 6).alias("map"),
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
    )
