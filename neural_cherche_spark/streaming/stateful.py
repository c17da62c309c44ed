"""Custom stateful streaming operators (``applyInPandasWithState``).

The ingestion side of a 100 TB training-data pipeline is a stream:
crawl batches arrive continuously and the two operations that MUST
see all history — "have I indexed this exact content before?" and
"what is the term traffic right now?" — need per-key state that
outlives any micro-batch. ``foreachBatch`` (streaming/incremental.py,
streaming/compressed.py) covers index maintenance, where the index
itself is the state; this module covers the operators whose state is
NOT the index, using Structured Streaming's own state store so it is
checkpointed, exactly-once versioned, and recovered on restart like
any other streaming state.

* :func:`streaming_exact_dedup` — first-seen exact dedup across the
  whole stream history. Keyed by a content-hash SHARD (not the hash
  itself: state-store keys should be bounded and balanced — shard
  count sets state parallelism, and each shard's state is one sorted
  digest array, not one state row per document). A row whose
  ``md5(text)`` was ever seen (any earlier micro-batch, or earlier in
  the same batch with a smaller ``doc_id``) is dropped.
* :func:`streaming_windowed_term_counts` — per-window term traffic
  with a watermark for late data; pure built-ins (explode + window +
  count), no Python in the path. The watermark bounds state: windows
  older than (max event time − delay) are finalized and evicted.

Reference tie-in: the reference has no streaming surface (``add()``
is its batch-incremental story, covered by SURVEY §2.8); these are
the beyond-reference pipeline operators the brief's
training-data-at-scale scope names explicitly.

Scale notes: state per shard is the distinct-digest set (16 B/doc);
at 10^10 distinct docs and 4096 shards that is ~40 MB/shard — held
in the state store (RocksDB-backed on a real cluster), read/written
once per micro-batch per ACTIVE shard only. Shard count is the
state-access parallelism; raise it with corpus size exactly like
shuffle partitions.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_DEDUP_STATE_SCHEMA = StructType(
    [StructField("digests", BinaryType(), True)]
)


def _dedup_out_schema(id_col: str, text_col: str) -> StructType:
    return StructType(
        [
            StructField(id_col, LongType(), True),
            StructField(text_col, StringType(), True),
            StructField("content_hash", StringType(), True),
        ]
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """First-seen exact dedup over the full stream history.

    Emits each distinct ``md5(text)`` exactly once — the first row
    carrying it (ties within a micro-batch break to the smallest
    ``id_col``). State per shard: one sorted array of 16-byte digests
    (compact, mergeable with one ``searchsorted`` pass — no per-doc
    state rows).

    The returned DataFrame is the streaming output; write it with
    ``outputMode("append")``. Deterministic given the batch contents,
    so ``foreachBatch`` sinks stay idempotent-friendly.
    """
    import numpy as np

    out_schema = _dedup_out_schema(id_col, text_col)

    def dedup(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (blob,) = state.get
            seen = np.frombuffer(blob, dtype="S16")
        else:
            seen = np.empty(0, dtype="S16")
        # concat the group's Arrow chunks before deduping so the
        # within-batch tie-break (smallest id) is chunk-order-free
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            pdf = pdf.sort_values(id_col, kind="mergesort")
            pdf = pdf[~pdf["__d"].duplicated(keep="first")]
            d = pdf["__d"].to_numpy(dtype="S16")
            if seen.size:
                pos = np.searchsorted(seen, d)
                hit = np.zeros(d.size, dtype=bool)
                inr = pos < seen.size
                hit[inr] = seen[pos[inr]] == d[inr]
                pdf = pdf[~hit]
                d = d[~hit]
            if d.size:
                seen = np.sort(np.concatenate([seen, d]))
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        text_col: pdf[text_col].to_numpy(),
                        "content_hash": [
                            x.hex() for x in pdf["__d"].to_numpy()
                        ],
                    }
                )
        state.update((seen.tobytes(),))

    keyed = stream.select(
        F.col(id_col),
        F.col(text_col),
        F.unhex(F.md5(F.col(text_col).cast("binary"))).alias("__d"),
    ).withColumn(
        "__shard",
        F.pmod(F.xxhash64("__d"), F.lit(int(n_shards))).cast("int"),
    )
    return keyed.groupBy("__shard").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_windowed_term_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    n_min: int = 3,
    n_max: int = 5,
) -> DataFrame:
    """Per-window term traffic with late-data watermarking.

    Pure built-ins end to end: watermark → char_wb tokenize (the
    Catalyst expression, no UDF) → explode → window+term groupBy
    count. The watermark lets the engine FINALIZE and evict windows
    older than (max event time − watermark) — without it, windowed
    state grows forever on an unbounded stream. Use
    ``outputMode("update")`` for running counts or ``append`` to emit
    each window once, when it closes.
    """
    from neural_cherche_spark.text.ngrams import ngram_terms_column

    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.explode(
                ngram_terms_column(text_col, n_min=n_min, n_max=n_max)
            ).alias("term"),
        )
        .groupBy(F.window(F.col(ts_col), window), F.col("term"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "term",
            "n",
        )
    )
