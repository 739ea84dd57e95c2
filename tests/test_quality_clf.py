"""llm/quality_clf.py: the MLlib quality classifier must separate a
synthetic reference corpus from synthetic noise, score monotonically
with the threshold, and keep scoring JVM-side (no Python rows)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.llm.quality_clf import (
    filter_by_quality,
    score_quality,
    train_quality_classifier,
)

_REF_WORDS = (
    "the market report shows that revenue and profit have grown with "
    "steady demand while the company expects further improvement in the "
    "coming year according to the latest filing"
).split()
_NOISE_WORDS = "zxq wvv kpl qqj xoxo brrt glrb snnk plom vrrt".split()


def _corpus(words, n_docs, seed, prefix):
    rng = random.Random(seed)
    return [
        (f"{prefix}{i}", " ".join(rng.choice(words) for _ in range(60)))
        for i in range(n_docs)
    ]


@pytest.fixture(scope="module")
def model_and_frames(spark):
    pos = spark.createDataFrame(
        _corpus(_REF_WORDS, 120, 1, "p"), "doc_id string, text string"
    )
    neg = spark.createDataFrame(
        _corpus(_NOISE_WORDS, 120, 2, "n"), "doc_id string, text string"
    )
    # small feature space + few iterations: the corpora are tiny and
    # linearly separable; the production default (2^18) is overkill in CI
    model = train_quality_classifier(pos, neg, n_features=1 << 12, max_iter=15)
    # held-out docs from the same two generators
    held = spark.createDataFrame(
        _corpus(_REF_WORDS, 40, 3, "hp") + _corpus(_NOISE_WORDS, 40, 4, "hn"),
        "doc_id string, text string",
    )
    return model, held


def test_separates_reference_from_noise(model_and_frames):
    model, held = model_and_frames
    scored = score_quality(model, held).collect()
    probs = {r["doc_id"]: r["quality_prob"] for r in scored}
    ref = [p for d, p in probs.items() if d.startswith("hp")]
    noise = [p for d, p in probs.items() if d.startswith("hn")]
    # every held-out reference doc outranks every held-out noise doc
    assert min(ref) > max(noise)
    acc = (sum(p >= 0.5 for p in ref) + sum(p < 0.5 for p in noise)) / 80
    assert acc >= 0.95


def test_filter_threshold_monotone(model_and_frames):
    model, held = model_and_frames
    kept = [
        filter_by_quality(model, held, min_prob=t).count()
        for t in (0.0, 0.3, 0.6, 0.9)
    ]
    assert kept[0] == 80
    assert kept == sorted(kept, reverse=True)
    with pytest.raises(ValueError, match="min_prob"):
        filter_by_quality(model, held, min_prob=1.5)


def test_schema_passthrough_and_jvm_scoring(model_and_frames, spark):
    model, held = model_and_frames
    docs = held.withColumn("url", F.concat(F.lit("http://x/"), "doc_id"))
    out = filter_by_quality(model, docs, min_prob=0.5)
    assert out.columns == docs.columns
    plan = score_quality(model, docs)._jdf.queryExecution().executedPlan().toString()
    # MLlib transform is JVM expressions/UDFs — no Arrow/Python row path
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # scoring is map-only over the scan


def test_model_scores_any_text_column_name(model_and_frames, spark):
    """Training canonicalizes to a 'text' input, so one model scores
    frames whose text column has a different name."""
    model, held = model_and_frames
    renamed = held.withColumnRenamed("text", "body")
    out = score_quality(model, renamed, text_col="body")
    assert set(out.columns) == {"doc_id", "body", "quality_prob"}
    assert out.count() == 80


def test_classifier_stage_in_funnel(model_and_frames, spark, tmp_path_factory):
    """The optional clf_filtered funnel stage drops noise pages the
    rule gate alone would keep."""
    import gzip

    from ir_analyses_spark.llm.curate import curation_stages
    from tests.test_curate import _record, _page

    model, _ = model_and_frames
    ref = " ".join(_REF_WORDS)          # reference-like page body
    noise = " ".join(_NOISE_WORDS * 4)  # gibberish but rule-passing length
    recs = [
        _record("http://a.example/good", _page([ref], "Good"), seq=0),
        _record("http://a.example/noise", _page([noise], "Noise"), seq=1),
    ]
    d = tmp_path_factory.mktemp("clf_crawl")
    (d / "c.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))
    base_kwargs = dict(
        quality_thresholds={"min_words": 10, "min_stopwords_present": 0},
    )
    without = curation_stages(spark, str(d), **base_kwargs)
    assert {r["title"] for r in without["final"].collect()} == {"Good", "Noise"}
    with_clf = curation_stages(
        spark, str(d), quality_model=model, min_quality_prob=0.5,
        **base_kwargs,
    )
    assert "clf_filtered" in with_clf
    assert {r["title"] for r in with_clf["final"].collect()} == {"Good"}
    with pytest.raises(ValueError, match="min_quality_prob"):
        curation_stages(
            spark, str(d), quality_model=model, min_quality_prob=2.0
        )


# slow: model save/load + CLI roundtrip; gate semantics pinned fast in this file
@pytest.mark.slow
def test_model_save_load_roundtrip_and_cli(model_and_frames, spark, tmp_path, capsys):
    """MLlib persistence: a saved model reloads and scores identically;
    curatectl drives the classifier gate from --quality-model."""
    import gzip
    import json

    from pyspark.ml import PipelineModel

    import curatectl
    from tests.test_curate import _record, _page

    model, held = model_and_frames
    mdir = str(tmp_path / "qmodel")
    model.write().overwrite().save(mdir)
    back = PipelineModel.load(mdir)
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, held).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(back, held).collect()}
    assert a == b  # coefficients roundtrip exactly
    # CLI e2e: the loaded model gates the funnel
    ref = " ".join(_REF_WORDS)
    noise = " ".join(_NOISE_WORDS * 4)
    recs = [
        _record("http://a.example/good", _page([ref], "Good"), seq=0),
        _record("http://a.example/noise", _page([noise], "Noise"), seq=1),
    ]
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "c.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))
    cfg = tmp_path / "c.toml"
    cfg.write_text(
        f'[curation]\nquality_model_path = "{mdir}"\nmin_quality_prob = 0.5\n'
        "\n[curation.quality_thresholds]\nmin_words = 10\n"
        "min_stopwords_present = 0\n"
    )
    out_dir = tmp_path / "corpus"
    rc = curatectl.main(
        ["--warc-dir", str(warc_dir), "--out-dir", str(out_dir),
         "--config", str(cfg), "--report"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_documents"] == 1
    assert report["funnel"]["clf_filtered"] == 1
    assert {r["title"] for r in spark.read.parquet(str(out_dir)).collect()} == {"Good"}


def test_bystander_text_column_survives_scoring(model_and_frames, spark):
    """Review-caught: scoring text_col='body' on a frame that ALSO has
    an unrelated 'text' column must not create an ambiguous reference;
    the bystander column comes through untouched."""
    model, held = model_and_frames
    docs = held.withColumnRenamed("text", "body").withColumn(
        "text", F.lit("unrelated metadata")
    )
    out = score_quality(model, docs, text_col="body")
    assert set(out.columns) == {"doc_id", "body", "text", "quality_prob"}
    rows = out.collect()
    assert all(r["text"] == "unrelated metadata" for r in rows)
    ref = [r["quality_prob"] for r in rows if r["doc_id"].startswith("hp")]
    noise = [r["quality_prob"] for r in rows if r["doc_id"].startswith("hn")]
    assert min(ref) > max(noise)  # scored the body, not the bystander
