"""Per-query instrumentation harness for the optimization round (guide §1).

NOT the frozen driver bench (bench.py). For each queries() entry this
measures, with the noop sink:

  * wall seconds (min of k runs, lineage rebuilt per run),
  * the number of Spark jobs the query triggers (fixed-overhead proxy:
    each job costs ~10-100 ms of scheduling at local[32] regardless of
    data volume),
  * and writes .explain("formatted") to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py [--tag before|after] [--runs 2] [--queries a,b,c]
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored like bench.py.

Results go to BENCH/extra_<tag>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans", action="store_true", help="capture explain output")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as ent
    from nabu_spark.session import get_spark

    spark = get_spark(
        app_name="nabu-bench-extra",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    qs = ent.queries()
    qs.pop("ann_recall", None)
    wanted = [q.strip() for q in args.queries.split(",") if q.strip()]
    if wanted:
        qs = {k: v for k, v in qs.items() if k in wanted}

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name, fn in qs.items():
        sc.setJobDescription(f"bench_extra:{name}")
        best = float("inf")
        n_jobs = -1
        err = None
        try:
            for i in range(args.runs):
                group = f"bx_{name}_{i}"
                sc.setJobGroup(group, name)
                t0 = time.monotonic()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                jobs = sc.statusTracker().getJobIdsForGroup(group)
                if dt < best:
                    best = dt
                    n_jobs = len(jobs)
            if args.plans:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(plan)
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {e}"[:300]
        out[name] = {
            "sec": round(best, 3) if best < float("inf") else None,
            "jobs": n_jobs,
            "err": err,
        }
        print(json.dumps({"q": name, **out[name]}), flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", f"extra_{args.tag}.json"
    )
    total = sum(v["sec"] for v in out.values() if v["sec"])
    with open(path, "w") as fh:
        json.dump({"total_sec": round(total, 3), "queries": out}, fh, indent=1)
    print(json.dumps({"total_sec": round(total, 3), "n": len(out)}))


if __name__ == "__main__":
    main()
