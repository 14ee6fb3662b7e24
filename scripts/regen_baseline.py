"""Regenerate BENCH/BASELINE.md from a saved bench_scaling JSON report.

Usage: python scripts/regen_baseline.py <report.json>
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    d = json.load(open(sys.argv[1]))
    hw, bench, pairs, n_pages = d["hw_docs_per_sec"], d["bench"], d["pairs"], d["pages"]
    levels = sorted(bench, key=int)
    md = f"""# BENCH baseline (measured)

Generated from a `python scripts/bench_scaling.py {n_pages}` run
(BENCH_RUNS env sets min-of-k; lineage rebuilt per timed run so Spark cannot
reuse the map stage) on {datetime.now(timezone.utc).isoformat(timespec="seconds")}.

The north rule's two-cluster-size criterion cannot use a real cluster in this
sandbox; per driver instruction it is evidenced by running the SAME job on the
SAME materialized input at two local parallelism levels. One caveat applies:
a single box shares memory bandwidth and turbo headroom across all cores, so
the *hardware ceiling* (identical kernel under plain multiprocessing, no
Spark) is measured alongside — a real 4N-executor cluster multiplies those
resources with the nodes; this box cannot.

## KG pipeline scaling (pages -> skolemized, URN-tagged quads)

| N -> 4N | triples/s @N | triples/s @4N | efficiency | hw ceiling eff | vs ceiling |
|---|---|---|---|---|---|
"""
    for p in pairs:
        md += (
            f"| local[{p['N']}] -> local[{p['4N']}] | {p['tput_N']} | {p['tput_4N']} "
            f"| **{p['efficiency']}** | {p['hw_ceiling_efficiency']} | {p['efficiency_vs_ceiling']} |\n"
        )
    md += f"""
Hardware kernel ceiling (docs/sec, plain multiprocessing): {json.dumps(hw)}

## Absolute throughput

| parallelism | kg wall sec | triples/sec | pages/sec |
|---|---|---|---|
"""
    for n in levels:
        b = bench[n]
        wall = round(n_pages / b["pages_per_sec"], 2)
        md += f"| local[{n}] | {wall} | {b['triples_per_sec']} | {b['pages_per_sec']} |\n"
    md += f"""
Corpus: {n_pages} synthetic Common-Crawl-style pages (deterministic seed=42,
Zipf-skewed hosts), {bench[levels[0]]["triples"]} triples out.

## Reference baseline

The reference (internetofwater/nabu) publishes no benchmark numbers
(see BASELINE.md); its throughput envelope is bounded by hand-tuned
concurrency (10 sitemaps x 10 workers, 20 release converters). The measured
numbers above stand as this repo's baseline for later rounds.

## Operator suite timings (sf dir = /root/testdata/sf0.1)

| query | """ + " | ".join(f"local[{n}] sec" for n in levels) + " |\n|---|" + "---|" * len(levels) + "\n"
    for name in bench[levels[0]]["queries"]:
        md += f"| {name} | " + " | ".join(
            str(bench[n]["queries"].get(name, "-")) for n in levels
        ) + " |\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
