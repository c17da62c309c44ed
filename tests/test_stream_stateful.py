"""Stateful streaming operators (streaming/stateful.py):
applyInPandasWithState exact dedup with checkpoint-persisted state,
and the watermarked windowed term-count wire."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neural_cherche_spark.streaming import (
    streaming_exact_dedup,
    streaming_windowed_term_counts,
)

DOC_SCHEMA = "doc_id long, text string"


def _run_dedup(spark, src, chk, out):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src)
    )
    q = (
        streaming_exact_dedup(stream, n_shards=4)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_exact_dedup_across_batches_and_restarts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")

    # batch 1: one in-batch duplicate pair (ids 0 and 2 share text)
    pd.DataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")],
        columns=["doc_id", "text"],
    ).to_parquet(src / "b1.parquet")
    _run_dedup(spark, str(src), chk, out)

    rows = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).collect()
    }
    # smallest id wins the in-batch tie
    assert rows == {(0, "alpha beta"), (1, "gamma delta")}

    # batch 2 arrives later; the query RESTARTS from the checkpoint —
    # cross-batch dedup state must survive via the state store
    pd.DataFrame(
        [(3, "alpha beta"), (4, "epsilon zeta"), (5, "gamma delta")],
        columns=["doc_id", "text"],
    ).to_parquet(src / "b2.parquet")
    _run_dedup(spark, str(src), chk, out)

    rows = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {
        (0, "alpha beta"),
        (1, "gamma delta"),
        (4, "epsilon zeta"),
    }


def test_dedup_content_hash_is_md5(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame(
        [(7, "some unique text")], columns=["doc_id", "text"]
    ).to_parquet(src / "b1.parquet")
    out = str(tmp_path / "out")
    _run_dedup(spark, str(src), str(tmp_path / "chk"), out)
    (r,) = spark.read.parquet(out).collect()
    assert r["content_hash"] == hashlib.md5(b"some unique text").hexdigest()


def test_windowed_term_counts_update_mode(spark, tmp_path):
    """Watermarked window+term counts over an event-time stream: the
    built-in wire produces per-window counts matching a batch groupBy
    of the same data (update mode, in-order events)."""
    src = tmp_path / "esrc"
    src.mkdir()
    rows = [
        ("2026-01-01 00:01:00", "aaa bbb"),
        ("2026-01-01 00:02:00", "aaa"),
        ("2026-01-01 00:12:00", "bbb"),
    ]
    # write the source with Spark (pandas would emit INT64 nanos,
    # which the streaming reader's timestamp schema rejects)
    spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "warc_ts string, text string"
    ).select(
        F.to_timestamp("warc_ts").alias("warc_ts"), "text"
    ).coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema("warc_ts timestamp, text string")
        .parquet(str(src))
    )
    counts = streaming_windowed_term_counts(
        stream, window="10 minutes", watermark="30 minutes"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("termcounts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "echk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (str(r["window_start"]), r["term"], r["n"])
        for r in spark.sql("select * from termcounts").collect()
    }
    # char_wb 3-5 grams of "aaa" = {aaa}; "bbb" = {bbb};
    # "aaa bbb" = {aaa, bbb}
    assert ("2026-01-01 00:00:00", "aaa", 2) in got
    assert ("2026-01-01 00:00:00", "bbb", 1) in got
    assert ("2026-01-01 00:10:00", "bbb", 1) in got


def _run_lsh(spark, src, chk, out, **kw):
    from neural_cherche_spark.streaming import streaming_lsh_candidates

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_lsh_candidates(stream, n_shards=4, **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_lsh_candidates_across_batches_and_restarts(spark, tmp_path):
    src = tmp_path / "lsrc"
    src.mkdir()
    out = str(tmp_path / "lout")
    chk = str(tmp_path / "lchk")
    text_a = "the quick brown fox jumps over the lazy dog today"
    text_b = "completely different words with no shared shingles here"

    # batch 1: ids 10 and 12 identical (every band collides, 12 -> 10);
    # id 11 unrelated; id 13 too short for a 3-shingle (passes silently)
    pd.DataFrame(
        [(10, text_a), (11, text_b), (12, text_a), (13, "too short")],
        columns=["doc_id", "text"],
    ).to_parquet(src / "b1.parquet")
    _run_lsh(spark, str(src), chk, out, num_hashes=8, bands=4)
    rows = {
        (r["doc_id"], r["band"], r["dup_of"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {(12, b, 10) for b in range(4)}

    # batch 2 after a RESTART: id 20 identical to batch-1's id 10 —
    # collisions must point at the FIRST holder recovered from the
    # checkpointed state, not at anything in batch 2
    pd.DataFrame(
        [(20, text_a), (21, "yet another unrelated document text")],
        columns=["doc_id", "text"],
    ).to_parquet(src / "b2.parquet")
    _run_lsh(spark, str(src), chk, out, num_hashes=8, bands=4)
    rows = {
        (r["doc_id"], r["band"], r["dup_of"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {(12, b, 10) for b in range(4)} | {
        (20, b, 10) for b in range(4)
    }


def test_lsh_band_keys_match_batch_pipeline(spark):
    """The per-row Catalyst band keys equal the batch
    word_shingles -> minhash_signatures -> band-key aggregation
    (value parity is what lets the streaming op share the batch
    oracle formulas)."""
    from neural_cherche_spark.ops.dedup import (
        minhash_signatures,
        word_shingles,
    )
    from neural_cherche_spark.streaming import lsh_band_key_exprs

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "one two three four five six seven"),
            (2, "alpha beta gamma delta epsilon zeta"),
        ],
        ["doc_id", "text"],
    )
    bands_col, sh_col, sig_col, words_col = lsh_band_key_exprs(
        "text", shingle_n=3, num_hashes=16, bands=4
    )
    per_row = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in docs.withColumn("__wd", words_col)
        .withColumn("__sh", sh_col)
        .withColumn("__sig", sig_col)
        .withColumn("__bk", bands_col)
        .select("doc_id", F.posexplode("__bk").alias("band", "band_key"))
        .collect()
    }
    sig = minhash_signatures(word_shingles(docs, n=3), num_hashes=16)
    rpb = 4
    batch = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in sig.withColumn("band", (F.col("seed") / rpb).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws("=", "seed", "minhash")
                        )
                    ),
                )
            ).alias("band_key")
        )
        .collect()
    }
    assert per_row == batch
