"""Model-based quality classifier for corpus curation (SURVEY §2B LLM
ext): the fastText-style "does this page look like the reference
corpus?" filter used by the GPT-3 / LLaMA / CCNet data recipes as the
stage AFTER rule-based gating — rules catch boilerplate and spam
shapes; a trained classifier catches fluency the rules cannot express.

Spark-first: features are hashed bags of word 1–2-grams
(``pyspark.ml.feature`` — JVM-side, no Python in the loop) and the
model is MLlib ``LogisticRegression`` (distributed L-BFGS), so both
training and scoring are single-scan JVM pipelines; scoring a 100 TB
corpus is a map-only transform with the (dim-bounded) coefficient
vector broadcast by MLlib itself.

Determinism: hashing features have no RNG; L-BFGS on a fixed corpus is
deterministic up to float reduction order, which is why this operator
is pytest-oracled (accuracy/separation invariants + the documented
threshold semantics) and NOT registry-oracled — the same boundary as
`llm/lm_score.py`'s perplexity scores. The label source here is the
standard weak-supervision recipe: positives = a reference corpus the
caller trusts, negatives = the raw crawl.

New module per the evidence-ledger rule; verified by
`tests/test_quality_clf.py` (separable synthetic corpora, threshold
monotonicity, scoring-plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_N_FEATURES = 1 << 18  # hashed feature space (fastText default order)


def _pipeline(text_col: str, n_features: int, max_iter: int):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, VectorAssembler

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_words", pattern=r"\s+", toLowercase=True
    )
    bigrams = NGram(n=2, inputCol="_words", outputCol="_bigrams")
    tf1 = HashingTF(
        inputCol="_words", outputCol="_f1", numFeatures=n_features
    )
    tf2 = HashingTF(
        inputCol="_bigrams", outputCol="_f2", numFeatures=n_features
    )
    feats = VectorAssembler(inputCols=["_f1", "_f2"], outputCol="_features")
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="_label",
        predictionCol="_prediction",
        probabilityCol="_probability",
        rawPredictionCol="_raw",
        regParam=1e-4,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tok, bigrams, tf1, tf2, feats, lr])


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    n_features: int = _N_FEATURES,
    max_iter: int = 50,
):
    """Train on reference-corpus positives vs raw-crawl negatives.

    Returns a fitted ``pyspark.ml.PipelineModel`` whose transform adds
    ``_probability`` (P[reference-like] at vector index 1). The model
    always reads a column named ``text`` (training canonicalizes
    ``text_col`` to it), so one fitted model scores corpus frames with
    ANY text column name via ``score_quality``'s rename; every
    intermediate column is underscore-scoped."""
    train = positives.select(
        F.col(text_col).alias("text"), F.lit(1.0).alias("_label")
    ).unionByName(
        negatives.select(F.col(text_col).alias("text"), F.lit(0.0).alias("_label"))
    )
    return _pipeline("text", n_features, max_iter).fit(train)


def score_quality(
    model, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Input columns + ``quality_prob`` — P[reference-like].

    The model always reads a column named ``text``; if the frame has
    BOTH the scored column and an unrelated ``text`` column, the
    bystander is parked under a reserved name for the transform and
    restored afterwards (a bare rename would create two ``text``
    columns and an ambiguous-reference failure — review-caught)."""
    from pyspark.ml.functions import vector_to_array

    src = docs
    clash = text_col != "text" and "text" in docs.columns
    if clash:
        src = src.withColumnRenamed("text", "__bystander_text")
    src = src.withColumnRenamed(text_col, "text")
    scored = model.transform(src)

    def restore(c: str):
        if c == text_col:
            return F.col("text").alias(text_col)
        if clash and c == "text":
            return F.col("__bystander_text").alias("text")
        return F.col(c)

    return scored.select(
        *[restore(c) for c in docs.columns],
        vector_to_array(F.col("_probability")).getItem(1).alias(
            "quality_prob"
        ),
    )


def filter_by_quality(
    model, docs: DataFrame, min_prob: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Documents scoring at least ``min_prob`` reference-likeness,
    original schema (the classifier-gate stage of a curation funnel)."""
    if not (0.0 <= min_prob <= 1.0):
        raise ValueError(f"min_prob must be in [0, 1], got {min_prob}")
    return (
        score_quality(model, docs, text_col)
        .filter(F.col("quality_prob") >= min_prob)
        .select(*docs.columns)
    )
