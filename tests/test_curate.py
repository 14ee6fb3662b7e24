"""End-to-end webtext curation funnel: pages/docs -> curated corpus.

The flagship composition (nabu_spark/curate.py): main-text extraction,
mojibake repair, hygiene, language/quality gates, exact + near-dup dedup,
per-host cap — with a single-aggregation funnel report."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from nabu_spark.curate import curate_corpus, curate_pages
from nabu_spark.operators.encoding import corrupt_text

VOCAB = ["river", "mountain", "forest", "valley", "stream", "meadow",
         "canyon", "ridge", "lake", "marsh", "field", "grove"]


def _text(seed: int, n: int = 80) -> str:
    r = random.Random(seed)
    return " ".join(r.choice(VOCAB) for _ in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"https://site{i % 4}.example.org/p/{i}", _text(i))
            for i in range(20)]
    rows += [
        (100, "https://site0.example.org/p/100", _text(3)),   # exact dup of 3
        (101, "https://site1.example.org/p/101",
         _text(5) + " extra meadow words appended"),          # near dup of 5
        (102, "https://site2.example.org/p/102", "short text"),  # gopher fail
        (103, "https://site3.example.org/p/103",
         corrupt_text(_text(9) + " café voilà")),  # mojibake near-dup of 9
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


class TestCurateCorpus:
    def test_funnel_and_survivors(self, spark, corpus):
        out, report = curate_corpus(corpus)
        ids = sorted(r["doc_id"] for r in out.collect())
        assert ids == list(range(20))
        assert report["n_input"] == 24
        assert report["n_mojibake_repaired"] == 1
        assert report["n_quality_ok"] == 23          # 102 fails gopher
        assert report["n_exact_unique"] == 22        # 100 removed
        # 101 (textual near-dup) AND 103 (near-dup only AFTER mojibake
        # repair — the repair stage is what makes it findable)
        assert report["n_near_dup_removed"] == 2
        assert report["n_curated"] == 20
        assert report["lsh_dropped_buckets"] == 0

    def test_cap_per_host(self, spark, corpus):
        out, report = curate_corpus(corpus, cap_per_host=3)
        per_host = (
            out.withColumn("_h", F.parse_url(F.col("url"), F.lit("HOST")))
            .groupBy("_h").count().collect()
        )
        assert all(r["count"] <= 3 for r in per_host)
        assert report["n_curated"] == sum(r["count"] for r in per_host)

    def test_pages_path(self, spark):
        from nabu_spark.sources.documents import content_pages_from_documents

        pages = content_pages_from_documents(spark, "/root/testdata/sf0.001")
        out, report = curate_pages(spark, pages)
        assert report["n_input"] == out.sparkSession.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).count()
        # extraction keeps headline + body; ids are xxhash64(url), url kept
        assert {"doc_id", "url", "text"} <= set(out.columns)
        assert report["n_curated"] > 0


class TestCurateCli:
    def test_cli_roundtrip(self, spark, corpus, tmp_path, capsys):
        from nabu_spark.cli import main

        docs_path = str(tmp_path / "docs")
        corpus.write.parquet(docs_path)
        out = str(tmp_path / "curated_out")
        rc = main(["curate", "--docs", docs_path, "--out", out])
        assert rc == 0
        printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert printed["n_curated"] == 20
        curated = spark.read.parquet(f"{out}/curated")
        assert curated.count() == 20
        with open(f"{out}/curate_report.json") as fh:
            assert json.load(fh)["n_input"] == 24

    def test_cli_with_shard_export(self, spark, corpus, tmp_path, capsys):
        import glob

        from nabu_spark.cli import main

        docs_path = str(tmp_path / "docs2")
        corpus.write.parquet(docs_path)
        out = str(tmp_path / "curated_shards")
        rc = main(["curate", "--docs", docs_path, "--out", out,
                   "--shards-target-tokens", "500"])
        assert rc == 0
        printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert printed["n_shards"] >= 2
        files = glob.glob(f"{out}/shards/data/shard=*/*.txt.gz")
        assert files
        with open(f"{out}/shards/manifest.json") as fh:
            m = json.load(fh)
        assert sum(s["rows"] for s in m["shards"]) == 20


class TestCurateFunnelPlan:
    """The repair/hygiene/gate portion of the funnel must contain NO
    shuffle: one fused Arrow pass + codegen expressions. (Joining the
    narrow stage outputs back on doc_id would shuffle the text column
    once per stage — the anti-pattern SCALING.md rules out.)"""

    def test_fused_stage_plan_direct(self, spark, corpus):
        """Direct probe: the cleaned+annotated frame (everything before
        dedup) executes with zero Exchange."""
        from pyspark.sql import functions as F

        from nabu_spark.operators.textstats import gopher_exprs, lang_scores

        # mirror curate's fused construction on the same corpus
        from nabu_spark.curate import curate_corpus  # noqa: F401
        import nabu_spark.curate as cur

        docs = corpus
        in_schema = dict(docs.dtypes)
        other = [c for c in docs.columns if c not in ("doc_id", "text")]

        import pandas as pd

        def fb(it):
            for pdf in it:
                out = pdf[["doc_id"] + other].copy()
                texts, rounds = [], []
                for t in pdf["text"]:
                    ft, r = cur.fix_clean_kernel(t)
                    texts.append(ft)
                    rounds.append(r)
                out["text"] = pd.Series(texts, dtype="object")
                out["repair_rounds"] = pd.Series(rounds, dtype="int32")
                yield out

        schema = ", ".join(
            ["doc_id " + in_schema["doc_id"]]
            + [f"{c} {in_schema[c]}" for c in other]
            + ["text string", "repair_rounds int"]
        )
        cleaned = docs.mapInPandas(fb, schema)
        annotated = cleaned.select("*", *lang_scores("text")).withColumn(
            "gopher_pass", gopher_exprs("text")["gopher_pass"]
        )
        plan = annotated._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert plan.count("MapInPandas") == 1


class TestC4Stage:
    @staticmethod
    def _rows():
        a = " ".join(
            f"The quick brown fox number {i} jumps over the lazy dog gracefully today."
            for i in range(8)
        )
        b = " ".join(
            f"Astronomers measured distant galaxy cluster {i} using careful spectra last winter."
            for i in range(8)
        )
        return [
            (0, a, "https://a.org/ok"),
            # distinct vocabulary, passes gopher, fails ONLY the C4 page verdict
            (1, b + " Lorem ipsum dolor sit amet placeholder.", "https://a.org/lorem"),
        ]

    def test_c4_gate_in_funnel(self, spark):
        from nabu_spark.curate import curate_corpus

        docs = spark.createDataFrame(
            self._rows(), "doc_id long, text string, url string"
        )
        out, report = curate_corpus(docs, c4=True)
        kept = {r.doc_id for r in out.collect()}
        assert kept == {0}
        assert report["n_c4_ok"] == 1
        assert report["n_curated"] == 1
        assert "c4_keep" not in out.columns

    def test_without_c4_both_survive(self, spark):
        from nabu_spark.curate import curate_corpus

        docs = spark.createDataFrame(
            self._rows(), "doc_id long, text string, url string"
        )
        out, report = curate_corpus(docs)
        assert {r.doc_id for r in out.collect()} == {0, 1}
        assert "n_c4_ok" not in report
