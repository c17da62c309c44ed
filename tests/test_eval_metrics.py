"""IR metrics vs hand-computed values (binary relevance)."""

from __future__ import annotations

import pytest

from neural_cherche_spark.eval import evaluate_run


def test_metrics_hand_computed(spark):
    # q0: rel {1,2,3}; hits at ranks 1,3,5
    # q1: rel {5}; hit at rank 1
    # q2: rel {7}; no hit in top-5
    run = spark.createDataFrame(
        [
            (0, 1, 1), (0, 9, 2), (0, 2, 3), (0, 8, 4), (0, 3, 5),
            (1, 5, 1), (1, 4, 2),
            (2, 1, 1), (2, 2, 2),
        ],
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (0, 3, 1), (1, 5, 1), (2, 7, 1)],
        "query_id long, doc_id long, relevance int",
    )
    row = evaluate_run(run, qrels, k=5).collect()[0]
    assert row["n_queries"] == 3
    assert row["hits"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["recall"] == pytest.approx(2 / 3, abs=1e-6)
    # AP(q0) = (1/1 + 2/3 + 3/5)/3 = 0.755556
    assert row["map"] == pytest.approx((0.7555556 + 1.0 + 0.0) / 3, abs=1e-5)
    # nDCG(q0): dcg = 1 + 1/log2(4) + 1/log2(6); idcg = 1 + 1/log2(3) + 1/log2(4)
    import math

    dcg = 1 + 1 / math.log2(4) + 1 / math.log2(6)
    idcg = 1 + 1 / math.log2(3) + 1 / math.log2(4)
    assert row["ndcg"] == pytest.approx((dcg / idcg + 1.0 + 0.0) / 3, abs=1e-5)


def test_metrics_empty_run(spark):
    run = spark.createDataFrame([], "query_id long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(0, 1, 1)], "query_id long, doc_id long, relevance int"
    )
    row = evaluate_run(run, qrels, k=5).collect()[0]
    assert row["hits"] == 0.0 and row["ndcg"] == 0.0 and row["map"] == 0.0
