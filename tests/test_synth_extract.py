"""Synthesizer determinism + html→text byte-identity (input_hint)."""

from __future__ import annotations

from neural_cherche_spark.data import synth_webtext
from neural_cherche_spark.text.extract import extract_text


def test_synth_partition_invariance(spark):
    a = synth_webtext(spark, 300, seed=42, num_partitions=2).orderBy("url").collect()
    b = synth_webtext(spark, 300, seed=42, num_partitions=8).orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len({r["url"] for r in a}) == 300


def test_extract_text_byte_identical(spark):
    df = synth_webtext(spark, 100, seed=1)
    bad = (
        df.withColumn("extracted", extract_text("html"))
        .filter("extracted IS DISTINCT FROM text")
        .count()
    )
    assert bad == 0


def test_schema_matches_input_hint(spark):
    df = synth_webtext(spark, 5)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]
