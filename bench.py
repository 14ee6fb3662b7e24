"""Per-round benchmark: headline KG pipeline + relational operator queries.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "triples_per_sec": ...,
   "pages_per_sec": ..., "cores": ...}

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_PAGES         synthetic KG corpus size (default scaled by sf)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    n_pages = int(os.environ.get("BENCH_PAGES", str(int(200_000 * sf_num / 0.1))))

    from pyspark.sql import functions as F

    import __spark_entry__ as ent
    from nabu_spark.datagen import generate_pages
    from nabu_spark.pipeline import pages_to_quads_fused
    from nabu_spark.session import get_spark

    spark = get_spark(
        app_name="nabu-bench",
        cores=cores,
        shuffle_partitions=cores,
        # bench corpora are small; shrink splits so every parallelism level
        # gets input splits (a real 100 TB table has thousands of files)
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # setup (untimed): materialize the synthetic corpus once — the real
    # workload reads a pre-crawled table, so generation is not benchmarked
    pages_path = f"/tmp/nabu_bench_pages_n{n_pages}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        # enough files that any parallelism level gets input splits (a real
        # 100 TB corpus has thousands of files; mimic that layout)
        generate_pages(spark, n_pages, partitions=256).write.mode("overwrite").parquet(
            pages_path
        )

    # headline: full KG pipeline over the Common-Crawl-style pages table.
    # One untimed full run spins up every python worker + Arrow codegen
    # (steady-state is what a long-running cluster job sees), then we time.
    # The lineage is rebuilt from scratch each run — reusing one DataFrame lets
    # Spark skip the map stage via shuffle-output reuse and times a no-op.
    def run_once():
        pages = spark.read.parquet(pages_path)
        quads = pages_to_quads_fused(pages, salt=False)
        return quads.agg(
            F.count(F.when(F.col("error_code").isNull(), 1)).alias("triples"),
            F.count(F.when(F.col("error_code").isNotNull(), 1)).alias("failures"),
        ).first()

    counts = run_once()  # warmup (untimed)
    kg_sec = float("inf")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    for _ in range(runs):  # min-of-k: the box is a VM with steal-time noise
        t0 = time.monotonic()
        counts = run_once()
        kg_sec = min(kg_sec, time.monotonic() - t0)
    # key must not collide with the queries() entry named "kg_pipeline"
    timings["kg_headline"] = round(kg_sec, 3)
    n_triples = counts["triples"]

    # mixed-format headline: 30% of pages carry microdata/RDFa instead of
    # JSON-LD (the long tail of the open web) — same fused path with the
    # structured fallback enabled
    mixed_path = f"/tmp/nabu_bench_pages_mixed_n{n_pages}"
    if not os.path.exists(os.path.join(mixed_path, "_SUCCESS")):
        generate_pages(
            spark, n_pages, partitions=256, structured_fraction=0.3
        ).write.mode("overwrite").parquet(mixed_path)

    def run_mixed():
        pages = spark.read.parquet(mixed_path)
        quads = pages_to_quads_fused(pages, salt=False, fallback_structured=True)
        return quads.agg(
            F.count(F.when(F.col("error_code").isNull(), 1)).alias("triples"),
            F.count(F.when(F.col("error_code").isNotNull(), 1)).alias("failures"),
        ).first()

    run_mixed()  # warmup
    mixed_sec = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        mixed_counts = run_mixed()
        mixed_sec = min(mixed_sec, time.monotonic() - t0)
    timings["kg_headline_mixed"] = round(mixed_sec, 3)

    # relational operator suite (the SURVEY §2 relational surface).
    # min-of-k per query as well: single-shot timings on this VM see 2-20x
    # steal-time spikes (a 1.3s query once measured 23s) — the lineage is
    # rebuilt per run inside fn(), so no shuffle reuse no-ops the repeats
    q_runs = int(os.environ.get("BENCH_QUERY_RUNS", "2"))
    # BENCH_QUERIES=0 skips the operator suite (the scaling protocol only
    # needs the KG headline; 4 parallelism levels x 54 queries is pure waste)
    qs = ent.queries() if os.environ.get("BENCH_QUERIES", "1") != "0" else {}
    # ann_recall is standing recall TELEMETRY (dozens of sub-jobs on its own
    # synthetic fixture), not an operator whose wall time belongs in the
    # suite comparison — correctness gates it; pytest asserts its target
    qs.pop("ann_recall", None)
    for name, fn in qs.items():
        best = float("inf")
        try:
            for _ in range(q_runs):
                t0 = time.monotonic()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
        except Exception:
            timings[name] = -1.0
            continue
        timings[name] = round(best, 3)

    total = round(sum(v for v in timings.values() if v > 0), 3)
    out = {
        "metric": "kg_pipeline_plus_operator_suite",
        "value": total,
        "unit": "sec",
        # COMPACT final line (VERDICT r4 task #2): the driver's tail-window
        # parse truncated an 80-entry per-query map in r4 — the line now
        # carries headline metrics only; the full per-query map goes to
        # BENCH/last_suite.json
        "queries": {
            "kg_headline": timings["kg_headline"],
            "kg_headline_mixed": timings["kg_headline_mixed"],
        },
        "suite_sec": total,
        "n_queries": len(timings),
        "n_failed": sum(1 for v in timings.values() if v < 0),
        "queries_file": "BENCH/last_suite.json",
        "sf": sf_num,
        "cores": cores,
        "pages": n_pages,
        "triples": int(n_triples),
        "triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec > 0 else None,
        "pages_per_sec": round(n_pages / kg_sec, 1) if kg_sec > 0 else None,
    }
    suite_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH", "last_suite.json")
    os.makedirs(os.path.dirname(suite_path), exist_ok=True)
    with open(suite_path, "w") as fh:
        json.dump({**out, "queries": timings}, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
