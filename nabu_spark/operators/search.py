"""Keyword retrieval over the document corpus: BM25 top-k.

The standard lexical-search scorer (Robertson/Sparck-Jones BM25), expressed
entirely in relational DataFrame ops — no UDFs, no inverted-index service:

  1. doc length per document (pure expression, no shuffle),
  2. term frequencies restricted to the query terms — the ``isin`` filter
     runs BEFORE the explode's aggregation so only matching tokens shuffle,
  3. document frequency per query term from that same tiny relation,
  4. score = sum over matched terms of
       idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
     with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
  5. global top-k via a rank window over the scored docs only.

Scale notes (100 TB): the only rows that survive past the corpus scan are
(doc, query-term) hits — for realistic queries a vanishing fraction of the
corpus — so the shuffles are proportional to hits, not corpus size. Corpus
constants (N, avgdl) ride along as a broadcast single-row join, keeping the
whole plan lazy instead of collecting scalars to the driver. The final
window sees only scored docs; if even that is too large, compose with the
per-partition top-k pre-reduction from ``similarity.brute_force_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import tokens_col


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` by BM25:
    (id, score, rank), deterministic ties broken by id."""
    docs = (
        df.select(F.col(id_col), tokens_col(text_col).alias("_toks"))
        .select(
            F.col(id_col), F.size("_toks").cast("long").alias("_dl"), "_toks"
        )
        .filter(F.col("_dl") > 0)
    )

    stats = docs.agg(
        F.count("*").cast("double").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )

    hits = (
        docs.select(id_col, "_dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "_dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    doc_freq = hits.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )

    scored = (
        hits.join(F.broadcast(doc_freq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "_w",
            F.col("_idf")
            * (F.col("tf") * (1.0 + k1))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("_w"), 4).alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", "rank")
    )


def bm25_oracle_sql(
    query_terms: list[str], *, k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """The DuckDB-equivalent SQL for ``bm25_topk`` over the ``documents``
    view — kept adjacent to the implementation so scorer and oracle evolve
    together."""
    terms = ", ".join("'%s'" % t.replace("'", "''") for t in query_terms)
    return f"""
        WITH docs AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ), dl AS (
          SELECT doc_id, len(toks)::DOUBLE AS dl, toks FROM docs
          WHERE len(toks) > 0
        ), stats AS (
          SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl
        ), hits AS (
          SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
          FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
          WHERE term IN ({terms})
          GROUP BY doc_id, dl, term
        ), df AS (
          SELECT term, count(*)::DOUBLE AS df FROM hits GROUP BY term
        ), scored AS (
          SELECT h.doc_id,
                 round(sum(
                   ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * (h.tf * (1 + {k1}))
                   / (h.tf + {k1} * (1 - {b} + {b} * h.dl / s.avgdl))
                 ), 4) AS score
          FROM hits h JOIN df f USING (term) CROSS JOIN stats s
          GROUP BY h.doc_id
        )
        SELECT doc_id, score, rank FROM (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rank
          FROM scored
        ) WHERE rank <= {k} ORDER BY rank
    """
