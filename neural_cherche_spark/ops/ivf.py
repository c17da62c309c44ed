"""IVF (inverted-file) approximate nearest neighbour over embeddings.

The third ANN shape next to ``ops/ann.py``'s exact brute force (the
≤10^5 verifier) and banded hyperplane LSH (the hash-bucket scale
path): partition the corpus by a small set of coarse centroids, then
search only the ``nprobe`` partitions whose centroids are closest to
the query — the FAISS ``IndexIVFFlat`` layout re-expressed as
DataFrame ops.

Reference tie-in: the reference's dense retrievers rank by full-corpus
cosine on torch tensors (retrieve/colbert.py:210-214 dense top-k);
IVF is the standard way that shape survives 10^9 vectors.

Design for scale, piece by piece:

* **Coarse centroids** are tiny (``n_centroids`` ≤ ~2^16 rows of
  ``dim`` floats — a 4096×768 float table is 12 MB) and are always
  carried as a broadcast table / numpy matrix. Everything big stays
  distributed.
* **Seeding is hash-deterministic** (smallest ``md5(vec_id)`` wins,
  :func:`ivf_seed_centroids`) so the whole structure — and therefore
  the DuckDB oracle in ``__spark_entry__`` — is reproducible with no
  RNG state. This is the classic random-pivot seeding; quality then
  improves with distributed Lloyd iterations (:func:`ivf_fit`).
* **Assignment** has two physical strategies with one semantics
  (argmax cosine, ties → lowest centroid_id):
  - ``method="catalyst"`` — broadcast-join the centroid table and
    fold the dot product JVM-side (`aggregate(zip_with(...))`,
    double arithmetic). Row count is n·n_centroids, so this is the
    oracle-parity path and the right choice only while n_centroids
    is small.
  - ``method="arrow"`` — ``mapInPandas``: per Arrow batch one
    float64 ``X @ C.T`` matmul + argmax. No row blow-up, BLAS speed;
    the 10^9-vector path.
* **Lloyd refinement** (:func:`ivf_fit`) is the textbook distributed
  k-means step: assign (above) → ``posexplode`` → per-(cluster, dim)
  mean → re-assemble arrays. Only the nc×dim centroid table is ever
  collected per iteration (exactly what ``pyspark.ml`` KMeans does);
  cosine is scale-invariant in the centroid so the unnormalized mean
  is a valid spherical-k-means update.
* **Query** (:func:`ivf_topk`): queries probe their ``nprobe``
  closest centroids, the (query, centroid) probe list — bounded by
  |queries|·nprobe — broadcast-joins the assigned corpus on
  ``centroid_id``, and exact cosine runs on that ~nprobe/n_centroids
  slice of the corpus only. Writing the assigned corpus partitioned
  by ``centroid_id`` (:func:`ivf_write_partitioned`) turns that join
  into a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neural_cherche_spark.ops.ann import _norm_col

# cast to double BEFORE multiplying (float32*float32 rounds at 1e-8
# and diverges from the DuckDB oracle's double arithmetic)
_DOT_VC = (
    "aggregate(zip_with(v, cv, (x, y) -> cast(x as double) * cast(y as double)), "
    "0.0D, (a, x) -> a + x)"
)


def ivf_seed_centroids(
    vecs: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(centroid_id, cv, cnr): hash-seeded coarse centroids.

    The ``n_centroids`` vectors with the smallest ``md5(id)`` digest
    (a deterministic uniform sample — ids don't cluster in hash
    space), numbered 0..n_centroids−1 in that same order. Runs as a
    single TakeOrderedAndProject (top-nc by digest), never a global
    sort materialization.
    """
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    seeds = (
        vecs.select(
            h.alias("__h"),
            F.col(id_col).alias("__sid"),
            F.col(vec_col).alias("cv"),
        )
        .orderBy("__h", "__sid")
        .limit(n_centroids)
    )
    w = Window.orderBy("__h", "__sid")  # ≤ n_centroids rows: single task is fine
    return seeds.select(
        (F.row_number().over(w) - 1).alias("centroid_id"),
        "cv",
        _norm_col("cv").alias("cnr"),
    )


def _centroid_cos(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, centroid_id, ccos): cosine of every vector against every
    centroid — broadcast crossJoin, JVM-side fold, rounded to 6
    decimals so the argmax tie-break is engine-portable (same
    rounding as every ANN oracle entry)."""
    base = vecs.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("v"),
        _norm_col(vec_col).alias("nr"),
    )
    return base.crossJoin(F.broadcast(centroids)).select(
        "__id",
        "centroid_id",
        F.round(F.expr(_DOT_VC) / (F.col("nr") * F.col("cnr")), 6).alias("ccos"),
    )


def ivf_assign(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "catalyst",
) -> DataFrame:
    """(id_col, centroid_id): nearest-centroid assignment.

    ``method="catalyst"`` materializes n·n_centroids scored rows
    (exact double fold; the oracle-parity path). ``method="arrow"``
    does one float64 matmul per Arrow batch — no row blow-up, the
    production path once n_centroids·n stops being a joke. Both use
    the same argmax semantics (cos desc, centroid_id asc)."""
    if method == "arrow":
        return _ivf_assign_arrow(vecs, centroids, id_col, vec_col)
    scored = _centroid_cos(vecs, centroids, id_col, vec_col)
    w = Window.partitionBy("__id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(F.col("__id").alias(id_col), "centroid_id")
    )


def _ivf_assign_arrow(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """mapInPandas assignment: per-batch X @ C.T argmax (float64).

    The centroid matrix rides the task closure (nc×dim floats — MBs
    at worst); each Arrow batch costs one BLAS matmul instead of
    n_centroids joined rows. Numerically this sums in a different
    order than the Catalyst fold, so ties within float ulps can land
    differently — same contract as any production ANN kernel, and why
    the oracle entry pins the catalyst path instead.
    """
    import numpy as np

    rows = centroids.orderBy("centroid_id").collect()
    cmat = np.asarray([r["cv"] for r in rows], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0.0] = 1.0

    out_schema = f"{id_col} long, centroid_id int"

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf[vec_col]]
            )
            xnorm = np.linalg.norm(x, axis=1)
            xnorm[xnorm == 0.0] = 1.0
            cos = (x @ cmat.T) / xnorm[:, None] / cnorm[None, :]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "centroid_id": np.argmax(cos, axis=1).astype("int32"),
                }
            )

    return vecs.select(id_col, vec_col).mapInPandas(fn, schema=out_schema)


def ivf_fit(
    vecs: DataFrame,
    n_centroids: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "catalyst",
) -> DataFrame:
    """Fit coarse centroids: hash seeding + ``iters`` distributed
    Lloyd steps. ``iters=0`` is the pure hash-pivot structure (the
    oracle-exact configuration); each step assigns the corpus and
    replaces every non-empty cluster's centroid with its member mean
    (empty clusters keep their previous centroid). Deterministic for
    a given input — no RNG anywhere."""
    spark = vecs.sparkSession
    cents = ivf_seed_centroids(vecs, n_centroids, id_col, vec_col)
    for _ in range(iters):
        assigned = ivf_assign(vecs, cents, id_col, vec_col, method)
        means = (
            assigned.join(vecs.select(id_col, vec_col), id_col)
            .select("centroid_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("cv")
            )
        )
        # nc×dim only — the same per-iteration collect pyspark.ml's
        # KMeans does; empty clusters fall back to their old centroid
        new_rows = {r["centroid_id"]: r["cv"] for r in means.collect()}
        old_rows = cents.orderBy("centroid_id").collect()
        merged = [
            (r["centroid_id"], new_rows.get(r["centroid_id"], r["cv"]))
            for r in old_rows
        ]
        cents = spark.createDataFrame(
            merged, schema=f"centroid_id int, cv array<float>"
        ).select("centroid_id", "cv", _norm_col("cv").alias("cnr"))
    return cents


def ivf_probe(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, centroid_id, probe_rank): the ``nprobe`` closest
    centroids per query — the partitions the search will open."""
    scored = _centroid_cos(queries, centroids, id_col, vec_col)
    w = Window.partitionBy("__id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(F.col("__id").alias(id_col), "centroid_id", "probe_rank")
    )


def ivf_topk(
    vecs: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "catalyst",
    exclude_self: bool = False,
) -> DataFrame:
    """(vec_id, neighbor_id, cos, rank): IVF approximate top-k.

    Plan shape: corpus assigned once (cacheable across query
    batches), probe list built per batch (|queries|·nprobe rows,
    broadcast side), equi-join on ``centroid_id`` restricts exact
    cosine to the probed slice — candidate volume is
    ~|queries|·nprobe/n_centroids·n instead of |queries|·n. Each
    corpus vector lives in exactly one cluster, so no pair dedup is
    needed. Recall improves monotonically with ``nprobe``
    (nprobe=n_centroids ≡ exact search)."""
    assigned = ivf_assign(vecs, centroids, id_col, vec_col, method).join(
        vecs.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("u"),
        ),
        F.col(id_col) == F.col("neighbor_id"),
    ).select(
        "centroid_id", "neighbor_id", "u", _norm_col("u").alias("nru")
    )
    probes = ivf_probe(queries, centroids, nprobe, id_col, vec_col).join(
        queries.select(
            F.col(id_col).alias("__qid"), F.col(vec_col).alias("v")
        ),
        F.col(id_col) == F.col("__qid"),
    ).select(
        F.col(id_col).alias("vec_id"), "centroid_id", "v",
        _norm_col("v").alias("nrv"),
    )
    cand = F.broadcast(probes).join(assigned, "centroid_id")
    if exclude_self:
        cand = cand.filter(F.col("vec_id") != F.col("neighbor_id"))
    dot = (
        "aggregate(zip_with(v, u, (x, y) -> cast(x as double) * cast(y as double)), "
        "0.0D, (a, x) -> a + x)"
    )
    scored = cand.select(
        "vec_id",
        "neighbor_id",
        F.round(F.expr(dot) / (F.col("nrv") * F.col("nru")), 6).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_write_partitioned(
    vecs: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "arrow",
) -> None:
    """Materialize the assigned corpus partitioned by ``centroid_id``
    so later probes become partition-pruned scans (only the nprobe
    directories a query batch touches are read at all)."""
    (
        ivf_assign(vecs, centroids, id_col, vec_col, method)
        .join(vecs, id_col)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
