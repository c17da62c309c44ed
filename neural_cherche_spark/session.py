"""SparkSession factory with engine defaults.

Local-mode knobs follow the public Spark tuning guidance: shuffle
partitions ~ cores, AQE on (coalesce + skew handling), Arrow enabled
for the pandas-UDF slow paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "neural_cherche_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("*", "") else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # zstd beats snappy on BOTH size and read wall for this
        # engine's tables (measured on the 100k-doc postings: 375 MB
        # snappy / 285 MB zstd, pyarrow bucket scan 0.066 s vs
        # 0.040 s — varint block payloads still compress, and zstd
        # decompress is cheaper than snappy here; guide §6)
        .config("spark.sql.parquet.compression.codec", "zstd")
        # joins: let the planner pick shuffled-hash over sort-merge when
        # the per-partition build side fits (guide §3.1) — the engine's
        # joins are id/term equi-joins where the hash build beats the
        # double sort; AQE can also rewrite SMJ→SHJ at runtime when
        # every post-shuffle partition is under the local-map threshold
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
