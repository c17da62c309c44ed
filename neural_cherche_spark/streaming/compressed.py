"""Incremental maintenance of the COMPRESSED postings index.

`streaming/incremental.py` reproduces the reference's quirky ``add()``
accumulation semantics (stale idf, per-batch avgdl — the doctest
goldens). This module is the SCALABLE-path counterpart: batches append
their tokenized term frequencies (the expensive pass — tokenization —
runs once per batch, never re-runs over old batches), and
``materialize()`` rebuilds the downstream statistics + postings from
the accumulated tf with GLOBALLY RECOMPUTED idf/avgdl — producing an
index artifact identical to a from-scratch ``build_index`` over the
union corpus (pytest pins this). That is the semantics a production
pipeline wants: the reference's stale-idf behavior is an in-memory
artifact, not a retrieval feature (reference bm25.py:185-196 applies
fresh idf only to new columns because re-weighting old CSR columns
in-place would be O(index) per add — a constraint Spark doesn't have
since the weight+postings stages are already incremental-safe bulk
jobs over the materialized tf).

At 10^12-doc scale: tokenize is ~all the build cost (BENCH r1:
tokenize-bound), so add_batch ≈ the marginal cost of the new data;
materialize() re-runs only the cheap aggregate/encode stages, and is
itself checkpoint-resumable (content fingerprint over the accumulated
tf). Epoch idempotency follows the same ledger pattern as
incremental.py — foreachBatch is at-least-once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neural_cherche_spark.index.build import BM25Config, term_frequencies


class CompressedIndexStream:
    """Accumulates tokenized batches under ``state_dir``; materializes
    a compressed BM25Index on demand. Batches must carry unique doc
    ids (re-adding an id is a corpus error here, unlike the
    reference-quirk path)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        cfg: BM25Config = BM25Config(),
        text_col: str = "text",
        id_col: str = "doc_id",
        url_col: str | None = None,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        self.url_col = url_col
        os.makedirs(state_dir, exist_ok=True)

    def _p(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _meta(self) -> dict:
        p = self._p("meta.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"n_batches": 0, "applied_epochs": {}}

    def _save_meta(self, m: dict) -> None:
        tmp = self._p("meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._p("meta.json"))

    def add_batch(
        self, docs: DataFrame, epoch_id: int | None = None
    ) -> "CompressedIndexStream":
        """Tokenize one batch and append its tf + doc registry.
        Batch-keyed overwrite writes + epoch ledger = replay-safe."""
        meta = self._meta()
        if epoch_id is not None and str(epoch_id) in meta.get(
            "applied_epochs", {}
        ):
            return self
        batch_id = meta["n_batches"]

        keyed = docs.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            (
                F.col(self.url_col)
                if self.url_col
                else F.col(self.id_col).cast("string")
            ).alias("url"),
            F.col(self.text_col).alias("text"),
        )
        term_frequencies(
            keyed, "text", "doc_id", self.cfg.n_min, self.cfg.n_max
        ).write.mode("overwrite").parquet(self._p(f"tf/batch={batch_id}"))
        keyed.select("doc_id", "url").write.mode("overwrite").parquet(
            self._p(f"docs/batch={batch_id}")
        )

        applied = meta.setdefault("applied_epochs", {})
        if epoch_id is not None:
            applied[str(epoch_id)] = batch_id
        meta["n_batches"] = batch_id + 1
        self._save_meta(meta)
        return self

    def materialize(
        self,
        index_dir: str,
        n_buckets: int | None = None,
        block_size: int = 128,
        salt_every: int = 50_000,
        resume: bool = True,
        weighting: str = "bm25",
    ):
        """Build (or refresh) the compressed index from the accumulated
        state. Identical artifact to ``build_index`` over the union of
        all batches — globally recomputed idf/avgdl/norms, same salted
        posting layout, same manifest stages/resume semantics."""
        from neural_cherche_spark.catalog import IndexCatalog
        from neural_cherche_spark.index.build import doc_lengths
        from neural_cherche_spark.index.builder import _finish_build

        spark, cfg = self.spark, self.cfg
        if self._meta()["n_batches"] == 0:
            raise RuntimeError("no batches added yet")
        if n_buckets is None:
            n_buckets = int(
                spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
        cat = IndexCatalog(index_dir)

        tf_acc = spark.read.parquet(self._p("tf")).select(
            "doc_id", "term", "tf"
        )
        # content fingerprint over the ACCUMULATED tf (cheap: already
        # tokenized) — any batch addition/replacement invalidates stages
        cfg_sig = (
            f"k1={cfg.k1},b={cfg.b},eps={cfg.epsilon},"
            f"n={cfg.n_min}-{cfg.n_max},"
            f"bs={block_size},se={salt_every},nb={n_buckets},w={weighting}"
        )
        row = tf_acc.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("doc_id", "term", "tf").cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        fingerprint = f"tf:{row['n']}:{row['h']}:{cfg_sig}"
        # mirror build_index._fingerprint's id validation (ADVICE r2):
        # out-of-range ids corrupt the packed (query_id<<41)|doc_id
        # combine and doc_salt subgrouping; a doc_id re-added across
        # batches double-counts silently. One column-pruned pass over
        # the (narrow) doc registry.
        from neural_cherche_spark.index.builder import MAX_DOC_ID

        drow = (
            spark.read.parquet(self._p("docs"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("doc_id").alias("nd"),
                F.min("doc_id").alias("lo"),
                F.max("doc_id").alias("hi"),
            )
            .collect()[0]
        )
        if drow["n"]:
            if drow["lo"] < 0 or drow["hi"] > MAX_DOC_ID:
                raise ValueError(
                    f"doc ids must be in [0, 2^41): got range "
                    f"[{drow['lo']}, {drow['hi']}] across accumulated batches"
                )
            if drow["nd"] != drow["n"]:
                raise ValueError(
                    f"duplicate doc_ids across batches: {drow['n']} rows, "
                    f"{drow['nd']} distinct — each batch must carry new ids"
                )
        manifest = cat.load_manifest() if resume else None
        walls: dict[str, float] = {}

        import time

        t0 = time.perf_counter()
        if not cat.stage_done(manifest, "tf", fingerprint):
            tf_acc.write.mode("overwrite").parquet(cat.path("tf"))
        walls["tf"] = time.perf_counter() - t0
        tf = spark.read.parquet(cat.path("tf"))

        t0 = time.perf_counter()
        if not cat.stage_done(manifest, "docmap", fingerprint):
            (
                spark.read.parquet(self._p("docs"))
                .select("doc_id", "url")
                .join(doc_lengths(tf), "doc_id", "left")
                .na.fill({"dl": 0})
                .write.mode("overwrite")
                .parquet(cat.path("docmap"))
            )
        walls["docmap"] = time.perf_counter() - t0
        return _finish_build(
            spark, cat, tf, fingerprint, cfg, n_buckets, block_size,
            salt_every, manifest, walls, index_dir, weighting,
        )


def stream_build_compressed(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    schema: str = "doc_id long, text string",
    cfg: BM25Config = BM25Config(),
    max_files_per_trigger: int = 1,
):
    """Structured Streaming wire for the compressed-index state: each
    micro-batch appends its tokenized tf (epoch-idempotent). Call
    ``CompressedIndexStream(...).materialize(index_dir)`` after (or
    periodically) to refresh the queryable index snapshot."""
    builder = CompressedIndexStream(spark, state_dir, cfg)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, bid: builder.add_batch(batch_df, epoch_id=bid)
        )
        .option(
            "checkpointLocation", os.path.join(state_dir, "_stream_ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
