"""Build-phase scaling decomposition: run ONLY the compressed-index
build at local[N] and local[4N] (fresh JVM each) and report PER-STAGE
walls from the manifest (tf / docmap / termdict / postings / lineage).

Motivation (VERDICT r2/r3 open question): the aggregate build
efficiency at 100k docs floats between 0.42 and 1.09 across identical
binaries — is the shortfall fixed per-job cost (Amdahl at toy scale,
fine at 10^12 docs) or a stage that genuinely doesn't scale? The
stage decomposition answers it directly: stages whose wall shrinks
~4× scale; stages whose wall is flat are fixed cost.

    python scripts/bench_build_stages.py [--n-docs 100000] [--n-low 2]

Appends a section to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/dev/shm/bench_build_stages"


def inner(cpus: int, n_docs: int, out_json: str) -> None:
    sys.path.insert(0, REPO)
    import time

    from neural_cherche_spark.data import synth_webtext
    from neural_cherche_spark.index.builder import build_index
    from neural_cherche_spark.session import get_spark

    # same scan protocol as bench_scale.py: 64 corpus part files +
    # 8 MB splits, so the tokenize map side has representative task
    # counts at BOTH levels (a 2-file corpus caps the scan at ~2 tasks
    # and flatlines the tf stage regardless of cores — measured: the
    # first cut of this script showed tf 164→132 s for exactly that
    # reason)
    spark = get_spark(
        app_name=f"build_stages_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g"),
            "spark.local.dir": WORK + "/spark-local",
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    corpus_path = f"{WORK}/corpus.parquet"
    if not os.path.exists(corpus_path):
        synth_webtext(spark, n_docs, seed=4).select(
            "url", "text"
        ).repartition(64).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    idx_dir = f"{WORK}/idx_{cpus}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.perf_counter()
    idx = build_index(
        spark, docs, idx_dir, id_col=None, n_buckets=64, resume=False,
        salt_every=max(1, n_docs // 8),
    )
    wall = time.perf_counter() - t0
    stages = {
        k: v.get("wall_s", 0.0) for k, v in idx.manifest.stages.items()
    }
    with open(out_json, "w") as f:
        json.dump(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "wall_s": round(wall, 3),
                "stages": stages,
            },
            f,
        )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--n-low", type=int, default=2)
    ap.add_argument("--inner", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.inner is not None:
        inner(args.inner, args.n_docs, args.out)
        return

    os.makedirs(WORK, exist_ok=True)
    results = {}
    for cpus in (args.n_low, args.n_low * 4):
        out_json = f"/tmp/bench_build_stages_{cpus}.json"
        if not os.path.exists(out_json):
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--inner", str(cpus), "--n-docs", str(args.n_docs),
                 "--out", out_json],
                check=True, cwd=REPO,
            )
        with open(out_json) as f:
            results[cpus] = json.load(f)

    lo, hi = results[args.n_low], results[args.n_low * 4]
    stage_rows = []
    for st in ("tf", "docmap", "termdict", "postings", "lineage"):
        a, b = lo["stages"].get(st, 0.0), hi["stages"].get(st, 0.0)
        sp = a / b if b > 0 else float("inf")
        stage_rows.append((st, a, b, sp, sp / 4.0))
    total_sp = lo["wall_s"] / hi["wall_s"]

    md = [
        "",
        f"## Build-stage scaling decomposition (round 4, local[{args.n_low}] "
        f"vs local[{args.n_low * 4}], {lo['n_docs']:,} docs)",
        "",
        "Aggregate build efficiency at toy scale swings 0.42–1.09 across",
        "identical binaries (r2/r3 open question). The per-stage walls from",
        "the manifest separate what scales from what is per-job fixed cost:",
        "",
        "| stage | local[{}] s | local[{}] s | speedup | efficiency |".format(
            args.n_low, args.n_low * 4
        ),
        "|---|---|---|---|---|",
    ]
    for st, a, b, sp, eff in stage_rows:
        md.append(f"| {st} | {a:.1f} | {b:.1f} | {sp:.2f}× | {eff:.2f} |")
    md += [
        f"| **total** | {lo['wall_s']:.1f} | {hi['wall_s']:.1f} | "
        f"{total_sp:.2f}× | {total_sp / 4.0:.2f} |",
        "",
        "Reading: stages dominated by wide scans/shuffles (tf tokenize,",
        "postings encode) should approach 4×; near-flat stages are driver",
        "coordination + job setup (fixed — amortizes to noise at real",
        "corpus sizes, where a stage runs thousands of tasks, not tens).",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({
        "n_docs": lo["n_docs"],
        "low": lo, "high": hi,
        "build_efficiency": round(total_sp / 4.0, 3),
    }))


if __name__ == "__main__":
    main()
