"""PII scrubbing + benchmark-contamination detection for training corpora.

Two standard stages of a web-scale LLM data pipeline (the CCNet/Dolma/
"decontamination" shape; the reference operates upstream of model training
and has no analogue — these extend the training-data operator family):

* ``redact_pii`` — replace emails / IPv4 addresses / international phone
  numbers with typed placeholder tokens and count each class. Pure codegen
  (``regexp_replace`` / ``regexp_extract_all`` column expressions): no
  Python in the hot path, whole-stage codegen end to end, trivially
  scale-linear. The patterns avoid lookarounds and backreferences so the
  SAME regex is valid and equivalent under Java regex (Spark) and RE2
  (DuckDB oracle).

* ``contamination_check`` — exact n-gram-overlap decontamination (the
  GPT-3/PaLM report methodology): a document is contaminated when it shares
  an n-word shingle with the benchmark set. Doc shingles are generated
  JVM-side (``transform`` over ``sequence`` + ``slice``, one explode) and
  equi-joined against the DISTINCT benchmark shingle set. At 100 TB the
  benchmark side is a fixed eval suite (thousands of docs, ~10^6 shingles)
  while the corpus side is the 100 TB — the benchmark side is explicitly
  broadcast so the corpus never shuffles; per-doc counts are a map-side
  combinable groupBy on the exploded join output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import tokens_col

# Java-regex AND RE2 compatible (no lookaround, no backreferences)
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+\d{1,3}[ .\-]?\(?\d{1,4}\)?(?:[ .\-]?\d{2,4}){2,3}"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, clean_text, n_emails, n_ips, n_phones).

    Counts are per-pattern matches on the ORIGINAL text; redaction applies
    sequentially email -> IPv4 -> phone (an email's host is redacted as part
    of the email, never double-redacted as an IP)."""
    text = F.col(text_col)
    clean = F.regexp_replace(text, PII_EMAIL, EMAIL_TOKEN)
    clean = F.regexp_replace(clean, PII_IPV4, IP_TOKEN)
    clean = F.regexp_replace(clean, PII_PHONE, PHONE_TOKEN)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0))).alias("n_phones"),
    )


def doc_shingles(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 8
) -> DataFrame:
    """(id, shingle) — every n-word shingle of every document, one row each.
    Tokenization shares ``tokens_col`` (lowercase, alnum runs) so shingles
    are whitespace/punctuation-insensitive."""
    toks = tokens_col(text_col)
    d = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    grams = F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> array_join(slice(_toks, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return d.select(
        F.col("_id").alias(id_col), F.explode(grams).alias("shingle")
    )


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 8,
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """Per-document benchmark overlap: (id, n_hits, n_unique, n_shingles,
    contamination_frac) for documents sharing >= 1 n-gram with the benchmark.

    ``benchmark`` is a DataFrame of reference texts (same id/text columns
    unless ``benchmark_text_col`` overrides). Its DISTINCT shingle set is
    broadcast — a fixed eval suite stays small while the corpus side scales;
    the corpus is read once, exploded, hash-joined without a corpus shuffle,
    and the per-doc aggregation combines map-side."""
    bcol = benchmark_text_col or text_col
    bench = (
        doc_shingles(benchmark, id_col, bcol, n=n)
        .select("shingle")
        .distinct()
    )
    docs = doc_shingles(df, id_col, text_col, n=n)
    hits = docs.join(F.broadcast(bench), "shingle").groupBy(id_col).agg(
        F.count("*").alias("n_hits"),
        F.countDistinct("shingle").alias("n_unique"),
    )
    toks = tokens_col(text_col)
    totals = df.select(
        F.col(id_col),
        F.greatest(F.size(toks) - (n - 1), F.lit(0)).cast("long").alias("n_shingles"),
    )
    return (
        hits.join(totals, id_col)
        .select(
            id_col,
            "n_hits",
            "n_unique",
            "n_shingles",
            F.round(F.col("n_unique") / F.col("n_shingles"), 4).alias(
                "contamination_frac"
            ),
        )
    )
