"""Model-based document quality scoring (the fasttext-classifier shape).

Production pipelines (GPT-3's WebText classifier, CCNet, RedPajama) follow
rule-based filters with a LEARNED quality score: a linear classifier over
hashed bag-of-words features, trained on weak labels (curated-vs-crawl, or
here: the Gopher rule battery as the weak labeler) and applied to every
document. This module wires that shape natively into pyspark.ml:

  * ``weak_labels`` — Gopher pass/fail as the training signal (any other
    label column works; the trainer only needs (text, label)).
  * ``train_quality_model`` — RegexTokenizer -> HashingTF (binary, 2^18
    features) -> LogisticRegression, fixed seed. The returned PipelineModel
    is a broadcastable bundle of JVM transformers.
  * ``score_quality`` — distributed apply; adds ``quality_prob`` (P(good))
    and ``quality_pred``.

Training is iterative (L-BFGS over the corpus) and the score is a learned
artifact, so there is no portable SQL oracle; verification is pytest:
separability on synthetic good/bad corpora, determinism under fixed seed,
and agreement with the weak labeler on held-out docs.

Scale notes (100 TB): HashingTF is stateless (no vocabulary shuffle —
exactly why fasttext-style hashing is the web-scale choice); LR training
aggregates gradients tree-wise per iteration; scoring is one narrow
map-side pass, model broadcast by Spark ML.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import gopher_quality_flags


def weak_labels(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, label): label 1.0 where the Gopher battery passes."""
    flags = gopher_quality_flags(df, id_col, text_col)
    return flags.join(df.select(id_col, text_col), id_col).select(
        id_col,
        text_col,
        F.when(F.col("gopher_pass"), 1.0).otherwise(0.0).alias("label"),
    )


def build_quality_pipeline(
    text_col: str = "text", *, num_features: int = 1 << 18, seed: int = 42
):
    """The untrained tokenize->hash->LR pipeline (exposed for tests)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_qtoks", pattern="[^a-zA-Z0-9]+",
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="_qtoks", outputCol="_qfeat", numFeatures=num_features,
        binary=True,
    )
    lr = LogisticRegression(
        featuresCol="_qfeat", labelCol="label", maxIter=30, regParam=1e-4,
        standardization=False,
    )
    lr.setPredictionCol("quality_pred").setProbabilityCol("_qprob")
    lr.setRawPredictionCol("_qraw")
    return Pipeline(stages=[tok, tf, lr])


def train_quality_model(
    labeled: DataFrame, text_col: str = "text", *, num_features: int = 1 << 18
):
    """Fit the classifier on (text, label) rows -> PipelineModel.

    The fitted model is round-tripped through disk to DROP the training
    summary: LogisticRegressionModel.trainingSummary holds the
    SparkSession, and the scoring UDF's closure serializes the whole model
    — which explodes with NotSerializableException(ObservationManager) once
    ANY Observation has been used in the session (the session's lazily
    created observationManager field is not Serializable; Spark 4.1 classic
    bug observed under test). Save/load is the supported way to detach the
    summary, and the model artifact is tiny."""
    import shutil
    import tempfile

    from pyspark.ml import PipelineModel

    model = build_quality_pipeline(text_col, num_features=num_features).fit(
        labeled
    )
    tmp = tempfile.mkdtemp(prefix="quality_model_")
    try:
        path = f"{tmp}/model"
        model.write().overwrite().save(path)
        return PipelineModel.load(path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def score_quality(
    model, df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """All input columns + quality_prob (P(label=1)) + quality_pred."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        "quality_prob", F.round(vector_to_array("_qprob").getItem(1), 6)
    ).drop("_qtoks", "_qfeat", "_qraw", "_qprob")
