"""Incremental index maintenance — the reference's ``add()`` semantics
as append-only Spark tables, plus a Structured Streaming wire.

The reference supports repeated ``add()`` calls with deliberately
quirky accumulation semantics (retrieve/bm25.py:146-197, empirically
pinned by the two-batch doctest goldens — SURVEY.md §2.8):

* vocabulary is fit ONCE on the first batch; later batches drop
  unseen terms (tfidf.py:96,114-117);
* ``avgdl`` is computed per batch, not globally (bm25.py:161);
* collection term frequency accumulates globally (bm25.py:155-157);
* idf is recomputed from the GLOBAL tf but applied only to the new
  batch's weights — old batches keep their stale idf (bm25.py:185-192);
* per-term L2 normalization is re-applied over the FULL accumulated
  matrix after each append (the semantics the shipped goldens encode).

Spark re-expression: three append-only parquet tables
(``vocab``, ``tf``, ``w2`` with a ``batch_id`` column) play the role
of the reference's frozen vectorizer / accumulated ``self.tf`` /
hstacked matrix. ``weights()`` derives the queryable normalized index
with one groupBy(term)+join — the re-normalization the reference does
in-place. A real deployment would swap the parquet appends for
Iceberg ``append()``/``MERGE INTO`` (catalog.py note).

``stream_build`` wires this into Structured Streaming via
``foreachBatch`` — each micro-batch is one reference-``add()``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neural_cherche_spark.index.build import BM25Config, term_frequencies


class IncrementalBM25Builder:
    """Append-only incremental BM25 state under ``state_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        cfg: BM25Config = BM25Config(),
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        os.makedirs(state_dir, exist_ok=True)

    # -- state helpers ----------------------------------------------------
    def _p(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _meta(self) -> dict:
        p = self._p("meta.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"n_batches": 0, "n_docs": 0, "applied_epochs": {}}

    def _save_meta(self, m: dict) -> None:
        # tmp + atomic rename: a crash mid-write must never leave a
        # truncated meta.json (epoch-idempotent replay depends on it)
        tmp = self._p("meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._p("meta.json"))

    def _read(self, name: str) -> DataFrame | None:
        p = self._p(name)
        return self.spark.read.parquet(p) if os.path.exists(p) else None

    # -- reference add() --------------------------------------------------
    def add_batch(
        self, docs: DataFrame, epoch_id: int | None = None
    ) -> "IncrementalBM25Builder":
        """One reference-``add()``. ``epoch_id`` (the foreachBatch batch
        id) makes replays idempotent: Structured Streaming delivers
        micro-batches AT-LEAST-once, so a batch replayed after a crash
        must not double-count tf / n_docs. Every per-batch write below
        is an overwrite of a batch-keyed location, and an epoch already
        recorded in meta.json is a no-op — so a crash at ANY point
        between writes replays cleanly."""
        cfg, idc = self.cfg, self.id_col
        meta = self._meta()
        if epoch_id is not None and str(epoch_id) in meta.get(
            "applied_epochs", {}
        ):
            return self
        batch_id = meta["n_batches"]

        tf_b = term_frequencies(
            docs, self.text_col, idc, cfg.n_min, cfg.n_max
        )
        if batch_id == 0:
            # fit-once vocabulary (tfidf.py:114-117); overwrite so a
            # replayed first batch doesn't fail on the existing path
            tf_b.select("term").distinct().write.mode("overwrite").parquet(
                self._p("vocab")
            )
        else:
            # frozen vectorizer: unseen terms drop (tfidf.py:134-135)
            vocab = self._read("vocab")
            tf_b = tf_b.join(vocab, "term", "left_semi")
        tf_b = tf_b.withColumn("batch_id", F.lit(batch_id)).cache()

        # per-batch dl/avgdl (bm25.py:159-161) — docs whose terms all
        # dropped still count with dl=0 via the left join
        dl_b = (
            docs.select(idc)
            .join(tf_b.groupBy(idc).agg(F.sum("tf").alias("dl")), idc, "left")
            .na.fill({"dl": 0})
        )
        n_batch_docs = dl_b.count()
        avgdl = dl_b.agg(F.avg("dl")).collect()[0][0] or 0.0

        # batch-keyed partition dir: a replay OVERWRITES its own batch's
        # rows instead of appending a duplicate copy
        tf_b.write.mode("overwrite").parquet(
            self._p(f"tf/batch={batch_id}")
        )

        # GLOBAL accumulated tf (bm25.py:155-157) and n_docs including
        # this batch (bm25.py:180-190)
        n_docs = meta["n_docs"] + n_batch_docs
        tf_total = (
            self._read("tf").groupBy("term").agg(F.sum("tf").alias("tf_total"))
        )
        idf = tf_total.withColumn(
            "idf",
            F.log(
                (F.lit(n_docs) - F.col("tf_total") + 0.5)
                / (F.col("tf_total") + 0.5)
                + 1.0
            ),
        ).select("term", "idf")

        # w1 (bm25.py:163-178) then ×idf — applied ONLY to this batch
        w2_b = (
            tf_b.join(dl_b, idc)
            .withColumn(
                "w1",
                F.col("tf")
                * (cfg.k1 + 1.0)
                / (
                    F.col("tf")
                    + cfg.k1 * (1.0 - cfg.b + cfg.b * F.col("dl") / F.lit(avgdl))
                )
                + F.lit(cfg.epsilon),
            )
            .join(idf, "term")
            .withColumn("w2", F.col("w1") * F.col("idf"))
            .select(idc, "term", "w2", "batch_id")
        )

        # SEQUENTIAL renormalization (the golden semantics, SURVEY §2.8):
        # the reference hstacks the new raw-weighted columns onto the
        # ALREADY-NORMALIZED stored matrix, then L2-normalizes each term
        # row again — so the stored (normalized) old weights, not their
        # raw w2, enter the new norm. Each add writes a new snapshot
        # version (Iceberg-style) so readers never see a half-written
        # table.
        prev = (
            self.spark.read.parquet(self._p(f"w_v{batch_id - 1}"))
            if batch_id > 0
            else None
        )
        full = (
            prev.select(idc, "term", F.col("w").alias("w2"),
                        F.lit(-1).alias("batch_id")).unionByName(w2_b)
            if prev is not None
            else w2_b
        )
        norms = full.groupBy("term").agg(
            F.sqrt(F.sum(F.col("w2") * F.col("w2"))).alias("nrm")
        )
        (
            full.join(norms, "term")
            .withColumn("w", F.col("w2") / F.col("nrm"))
            .select(idc, "term", "w")
            .write.mode("overwrite")  # replay-safe snapshot write
            .parquet(self._p(f"w_v{batch_id}"))
        )
        tf_b.unpersist()

        applied = meta.setdefault("applied_epochs", {})
        if epoch_id is not None:
            applied[str(epoch_id)] = batch_id
        meta.update(n_batches=batch_id + 1, n_docs=n_docs)
        self._save_meta(meta)
        return self

    def weights(self) -> DataFrame:
        """(doc_id, term, w): current snapshot version."""
        meta = self._meta()
        if meta["n_batches"] == 0:
            raise RuntimeError("no batches added yet")
        return self.spark.read.parquet(self._p(f"w_v{meta['n_batches'] - 1}"))

    def retrieve(self, queries: DataFrame, k: int = 10) -> DataFrame:
        from neural_cherche_spark.query.exact import retrieve_exact

        return retrieve_exact(
            self.weights(), queries, k=k, doc_id=self.id_col,
            n_min=self.cfg.n_min, n_max=self.cfg.n_max,
        )


def stream_build(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    schema: str = "doc_id long, text string",
    cfg: BM25Config = BM25Config(),
    max_files_per_trigger: int = 1,
):
    """Structured Streaming wire: every micro-batch of new documents is
    one reference-``add()``. ``availableNow`` drains the backlog and
    stops (tests); drop it for a continuous ingest."""
    builder = IncrementalBM25Builder(spark, state_dir, cfg)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    return (
        stream.writeStream.foreachBatch(
            # pass the epoch id through: foreachBatch is at-least-once,
            # add_batch dedupes replayed epochs (ADVICE r1 medium)
            lambda batch_df, bid: builder.add_batch(batch_df, epoch_id=bid)
        )
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
