"""SURVEY §2.2 P5 — model-input decoration parity with the reference
encode preamble (models/base.py:29-34, splade.py:205-207,
colbert.py:208-209), as a pure Catalyst expression."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_cherche_spark.text.decorate import decorate


def _reference_decorate(texts, query_mode, n_mask_tokens, mask="[MASK]"):
    # verbatim reference semantics: splade.py:205-207 (with suffix) /
    # colbert.py:208-209 (without)
    prefix = "[Q] " if query_mode else "[D] "
    if n_mask_tokens:
        suffix = " ".join([mask] * n_mask_tokens)
        return [prefix + t + " " + suffix for t in texts]
    return [prefix + t for t in texts]


def test_decorate_matches_reference_shapes(spark):
    texts = ["hello world", "", "a  b\tc", "café ☕"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for query_mode in (False, True):
        for n_mask in (0, 5):
            got = [
                r["d"]
                for r in df.select(
                    decorate(
                        "text", query_mode=query_mode, n_mask_tokens=n_mask
                    ).alias("d")
                ).collect()
            ]
            want = _reference_decorate(texts, query_mode, n_mask)
            assert got == want, (query_mode, n_mask)


def test_decorate_null_passthrough(spark):
    df = spark.createDataFrame([(None,), ("x",)], "text string")
    got = df.select(
        decorate("text", n_mask_tokens=2).alias("d")
    ).collect()
    assert got[0]["d"] is None
    assert got[1]["d"] == "[D] x [MASK] [MASK]"


def test_decorate_stays_jvm_side(spark):
    # whole-stage codegen, no BatchEvalPython / ArrowEvalPython in the
    # plan — the pre-encode hot path must not be a Python UDF
    df = spark.range(4).select(F.concat(F.lit("t"), "id").alias("text"))
    plan = (
        df.select(decorate("text").alias("d"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
