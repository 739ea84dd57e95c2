"""curatectl.py e2e: the CLI writes the curated corpus and reports the
funnel, reusing the synthesized crawl from test_curate."""

from __future__ import annotations

import gzip
import json

import curatectl
from tests.test_curate import CRAWL

import pytest


def test_cli_end_to_end(spark, tmp_path, capsys):
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in CRAWL)
    )
    blocklist = tmp_path / "blocked.txt"
    blocklist.write_text("# comment line\nspam.example  # inline\n\n")
    out_dir = tmp_path / "corpus"
    rc = curatectl.main(
        [
            "--warc-dir", str(warc_dir),
            "--out-dir", str(out_dir),
            "--blocklist", str(blocklist),
            "--min-words", "10",
            "--report",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_documents"] == 3
    assert report["funnel"]["records"] == 11
    assert report["funnel"]["final"] == 3
    rows = spark.read.parquet(str(out_dir)).collect()
    assert {r["title"] for r in rows} == {"Page A", "Page B", "Page C"}
    assert all(r["text"] for r in rows)


# slow: CLI config plumbing; parsing pinned fast in test_config_toml
@pytest.mark.slow
def test_cli_config_toml_drives_thresholds(spark, tmp_path, capsys):
    """r7 VERDICT item 7: blocklists, caps, and thresholds come from a
    [curation] TOML section; explicit CLI flags override it."""
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in CRAWL)
    )
    cfg = tmp_path / "curation.toml"
    cfg.write_text(
        '[curation]\n'
        'blocked_domains = ["spam.example"]\n'
        'max_pages_per_domain = 1000\n'
        '\n'
        '[curation.quality_thresholds]\n'
        'min_words = 10\n'
    )
    out_dir = tmp_path / "corpus_cfg"
    rc = curatectl.main(
        ["--warc-dir", str(warc_dir), "--out-dir", str(out_dir),
         "--config", str(cfg), "--report"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # identical outcome to the flag-driven run: blocklist + threshold
    # both flowed from the TOML
    assert report["n_documents"] == 3
    assert report["funnel"]["unblocked"] == report["funnel"]["pages"] - 1
    # CLI overrides the file: a stricter min-words gates everything out
    out2 = tmp_path / "corpus_cli"
    rc = curatectl.main(
        ["--warc-dir", str(warc_dir), "--out-dir", str(out2),
         "--config", str(cfg), "--min-words", "10000"]
    )
    assert rc == 0
    report2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report2["n_documents"] == 0


def test_cli_config_unknown_key_fails_loudly(tmp_path):
    cfg = tmp_path / "bad.toml"
    cfg.write_text("[curation]\nmax_pages = 5\n")
    import pytest

    with pytest.raises(ValueError, match="unknown \\[curation\\] config keys"):
        curatectl.main(
            ["--warc-dir", str(tmp_path), "--out-dir", str(tmp_path / "o"),
             "--config", str(cfg)]
        )


def test_cli_explicit_config_missing_or_malformed_fails(tmp_path):
    """Review-caught: an explicit --config that doesn't exist or doesn't
    parse must fail loudly, not silently run the funnel with defaults."""
    import pytest
    import tomllib

    with pytest.raises(FileNotFoundError):
        curatectl.main(
            ["--warc-dir", str(tmp_path), "--out-dir", str(tmp_path / "o"),
             "--config", str(tmp_path / "nope.toml")]
        )
    bad = tmp_path / "broken.toml"
    bad.write_text("[curation\nmax_pages_per_domain = 5\n")
    with pytest.raises(tomllib.TOMLDecodeError):
        curatectl.main(
            ["--warc-dir", str(tmp_path), "--out-dir", str(tmp_path / "o"),
             "--config", str(bad)]
        )


def test_cli_min_quality_prob_without_model_fails(tmp_path):
    """Review-caught: a classifier threshold with no model must not
    silently run an ungated funnel."""
    import pytest

    with pytest.raises(ValueError, match="requires a quality model"):
        curatectl.main(
            ["--warc-dir", str(tmp_path), "--out-dir", str(tmp_path / "o"),
             "--min-quality-prob", "0.9"]
        )


# slow: CLI stage twin of test_curate::test_substring_dedup_stage
@pytest.mark.slow
def test_cli_substring_dedup_stage(spark, tmp_path, capsys):
    """--substring-dedup runs the ladder's bottom rung from the CLI:
    the mid-line duplicated run survives in exactly one output doc,
    and the funnel report carries the stage."""
    import gzip

    from tests.test_curate import _page, _record

    boiler = (
        "this exact disclaimer sentence is repeated verbatim across publishers"
    )
    recs = [
        _record(
            "http://a.com/1",
            _page([f"alpha opening words here {boiler} and a first unique "
                   f"tail of words"], "One"),
            seq=0,
        ),
        _record(
            "http://b.com/2",
            _page([f"beta opening words of the report {boiler} and a second "
                   f"unique tail"], "Two"),
            seq=1,
        ),
    ]
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )
    out_dir = tmp_path / "corpus"
    rc = curatectl.main(
        [
            "--warc-dir", str(warc_dir),
            "--out-dir", str(out_dir),
            "--min-words", "8",
            "--substring-dedup",
            "--substring-dedup-k", "16",
            "--substring-dedup-window", "8",
            "--report",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "substring_deduped" in report["funnel"]
    texts = [r["text"] for r in spark.read.parquet(str(out_dir)).collect()]
    assert sum(1 for t in texts if boiler in t) == 1


def test_cli_substring_knobs_without_stage_fail(tmp_path):
    """k/window without the stage enabled must not silently tune
    nothing (same contract as min_quality_prob without a model)."""
    import pytest

    with pytest.raises(ValueError, match="require the stage"):
        curatectl.main(
            ["--warc-dir", str(tmp_path), "--out-dir", str(tmp_path / "o"),
             "--substring-dedup-k", "24"]
        )


# slow: CLI lifecycle twin; the incremental store semantics are pinned fast in test_substring_dedup
@pytest.mark.slow
def test_cli_incremental_substring_store(spark, tmp_path, capsys):
    """r9 VERDICT item 3, end to end through the CLI: batch 1 exports
    and seeds the versioned fingerprint store; batch 2 — which contains
    batch 1's shipped run exactly ONCE, so only the store can know it
    is a duplicate — gets it cut (first-seen-wins across batches); and
    a later run with mismatched parameters fails loudly instead of
    silently no-opping."""
    import gzip

    import pytest

    from ir_analyses_spark.llm.substring_dedup import (
        FingerprintStoreMismatch,
    )
    from tests.test_curate import _page, _record

    boiler = (
        "this exact disclaimer sentence is repeated verbatim across publishers"
    )
    store = str(tmp_path / "fps_store")

    b1 = tmp_path / "crawl1"
    b1.mkdir()
    (b1 / "c.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in [
        _record(
            "http://a.com/1",
            _page([f"alpha filing with the details {boiler}"
                   " and a closing note that ends the page"], "One"),
            seq=0,
        ),
        _record(
            "http://b.com/2",
            _page(["beta page of entirely original words that carry the"
                   " batch along nicely"], "Two"),
            seq=1,
        ),
    ]))
    out1 = tmp_path / "corpus1"
    rc = curatectl.main(
        ["--warc-dir", str(b1), "--out-dir", str(out1),
         "--min-words", "8", "--substring-dedup",
         "--substring-store", store, "--report"]
    )
    assert rc == 0
    report1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report1["n_documents"] == 2
    # batch 1 kept its single occurrence and seeded the store
    texts1 = [r["text"] for r in spark.read.parquet(str(out1)).collect()]
    assert sum(1 for t in texts1 if boiler in t) == 1
    meta = spark.read.json(f"{store}/_store_meta").head()
    assert meta["k"] == 16 and meta["window"] == 8
    assert spark.read.parquet(f"{store}/fingerprints").count() > 0

    b2 = tmp_path / "crawl2"
    b2.mkdir()
    (b2 / "c.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in [
        _record(
            "http://c.com/3",
            _page([f"gamma report that quotes the boilerplate {boiler}"
                   " and a fresh tail with words of its own"], "Three"),
            seq=0,
        ),
        _record(
            "http://d.com/4",
            _page(["delta page that adds plenty more filler prose to"
                   " the second batch"], "Four"),
            seq=1,
        ),
    ]))
    out2 = tmp_path / "corpus2"
    rc = curatectl.main(
        ["--warc-dir", str(b2), "--out-dir", str(out2),
         "--min-words", "8", "--substring-dedup",
         "--substring-store", store, "--report"]
    )
    assert rc == 0
    report2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report2["n_documents"] == 2
    texts2 = {r["url"]: r["text"]
              for r in spark.read.parquet(str(out2)).collect()}
    # the shipped run is cut from batch 2's SINGLE occurrence — only
    # the store can have flagged it
    assert not any(boiler in t for t in texts2.values())
    gamma = texts2["http://c.com/3"]
    assert "gamma report" in gamma and "fresh tail" in gamma
    # batch 2's own fingerprints were appended after its export
    n_fps_after = spark.read.parquet(f"{store}/fingerprints").count()
    assert n_fps_after > 0

    # mismatched parameters refuse loudly (r9 ADVICE)
    with pytest.raises(FingerprintStoreMismatch):
        curatectl.main(
            ["--warc-dir", str(b2), "--out-dir", str(tmp_path / "o3"),
             "--min-words", "8", "--substring-dedup",
             "--substring-dedup-k", "24", "--substring-store", store]
        )


def test_cli_substring_store_without_stage_fails(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="require the stage"):
        curatectl.main(
            ["--warc-dir", str(tmp_path), "--out-dir", str(tmp_path / "o"),
             "--substring-store", str(tmp_path / "s")]
        )


# slow: CLI crash-ordering lifecycle; the store append contract is pinned in test_substring_dedup
@pytest.mark.slow
def test_cli_export_store_crash_contract(spark, tmp_path, capsys, monkeypatch):
    """r10 VERDICT item 4 — the prose crash contract, executable: a
    crash between the corpus export landing and the fingerprint append
    must (a) leave the shipped export intact, (b) degrade future
    batches to KEEPING a duplicate — never cutting text the store
    doesn't describe — and (c) converge once a re-run's append lands.
    """
    import gzip

    import pytest

    import ir_analyses_spark.llm.substring_dedup as sd
    from tests.test_curate import _page, _record

    boiler = (
        "this exact disclaimer sentence is repeated verbatim across publishers"
    )
    store = str(tmp_path / "fps_store")

    def crawl(d, url, lead):
        d.mkdir()
        (d / "c.warc.gz").write_bytes(gzip.compress(_record(
            url,
            _page([f"{lead} {boiler} and a tail of its very own words"],
                  "T"),
            seq=0,
        )))

    b1 = tmp_path / "crawl1"
    crawl(b1, "http://a.com/1", "alpha filing with the details")

    # the simulated crash: the export write has landed, the store
    # append dies AFTER the meta write but BEFORE any fingerprint row
    # (r10 ADVICE item 1's exact window)
    def crash_append(
        fps, path, k, window,
        hash_scheme=sd.DEFAULT_HASH_SCHEME, allow_stale_identity=False,
    ):
        from ir_analyses_spark.io.warc_datasource import IDENTITY_RENDERING

        fps.sparkSession.createDataFrame(
            [(int(k), int(window), hash_scheme, sd._STORE_FORMAT_VERSION,
              IDENTITY_RENDERING)],
            "k int, window int, hash_scheme string, format_version int, "
            "identity_rendering string",
        ).coalesce(1).write.mode("overwrite").json(f"{path}/_store_meta")
        raise RuntimeError("simulated crash between export and append")

    out1 = tmp_path / "corpus1"
    monkeypatch.setattr(sd, "write_fingerprint_store", crash_append)
    with pytest.raises(RuntimeError, match="simulated crash"):
        curatectl.main(
            ["--warc-dir", str(b1), "--out-dir", str(out1),
             "--min-words", "8", "--substring-dedup",
             "--substring-store", store]
        )
    monkeypatch.undo()
    # (a) the export landed and shipped its text uncut
    texts1 = [r["text"] for r in spark.read.parquet(str(out1)).collect()]
    assert sum(1 for t in texts1 if boiler in t) == 1
    # the store is the meta-only shape: stats read it as empty
    st = sd.fingerprint_store_stats(spark, store)
    assert st["n_rows"] == 0 and st["k"] == 16

    # (b) a second batch against the crashed store KEEPS its copy of
    # the boilerplate — the store doesn't describe batch 1's export,
    # so cutting would lose text nothing shipped canonically... and
    # conservative means keep
    b2 = tmp_path / "crawl2"
    crawl(b2, "http://b.com/2", "beta report that quotes")
    out2 = tmp_path / "corpus2"
    rc = curatectl.main(
        ["--warc-dir", str(b2), "--out-dir", str(out2),
         "--min-words", "8", "--substring-dedup",
         "--substring-store", store]
    )
    assert rc == 0
    texts2 = [r["text"] for r in spark.read.parquet(str(out2)).collect()]
    assert sum(1 for t in texts2 if boiler in t) == 1  # duplicate KEPT
    # (c) batch 2's append repaired the store: it now has fingerprints
    assert sd.fingerprint_store_stats(spark, store)["n_rows"] > 0

    # ...and from here the flow converges: a third batch with the same
    # boilerplate gets it cut against the repaired store
    b3 = tmp_path / "crawl3"
    crawl(b3, "http://c.com/3", "gamma page that repeats")
    out3 = tmp_path / "corpus3"
    rc = curatectl.main(
        ["--warc-dir", str(b3), "--out-dir", str(out3),
         "--min-words", "8", "--substring-dedup",
         "--substring-store", store]
    )
    assert rc == 0
    texts3 = [r["text"] for r in spark.read.parquet(str(out3)).collect()]
    assert not any(boiler in t for t in texts3)
    capsys.readouterr()


def test_cli_store_maintenance_mode(spark, tmp_path, capsys):
    """--compact-store / --store-stats run standalone (no crawl flags)
    and print one JSON line, mirroring txnctl for the txn table."""
    import json as _json

    import ir_analyses_spark.llm.substring_dedup as sd

    store = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(0, "a corpus of words that is long enough to winnow some grams")],
        "doc_id bigint, text string",
    )
    fps = sd.winnow_fingerprints(docs, k=16, window=8)
    sd.write_fingerprint_store(fps, store, 16, 8)
    sd.write_fingerprint_store(fps, store, 16, 8)  # a re-run's append

    rc = curatectl.main(["--store-stats", store])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n = out["stats"]["n_distinct"]
    assert out["stats"]["n_rows"] == 2 * n > 0
    assert out["stats"]["n_compactions"] == 0

    rc = curatectl.main(["--compact-store", store, "--store-stats", store])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compact"]["rows_before"] == 2 * n
    assert out["compact"]["rows_after"] == n
    assert out["stats"]["n_rows"] == n
    assert out["stats"]["n_compactions"] == 1


def test_cli_maintenance_and_crawl_flags_are_exclusive(tmp_path, capsys):
    import pytest

    with pytest.raises(SystemExit):
        curatectl.main(
            ["--compact-store", str(tmp_path / "s"),
             "--warc-dir", str(tmp_path)]
        )
    # EVERY crawl flag is rejected, not just the directory pair — a
    # silently ignored --substring-dedup-window or --report on a
    # maintenance run is a silent no-op (review-caught)
    with pytest.raises(SystemExit):
        curatectl.main(
            ["--store-stats", str(tmp_path / "s"),
             "--substring-dedup-window", "35"]
        )
    assert "--substring-dedup-window" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        curatectl.main(["--compact-store", str(tmp_path / "s"), "--report"])
    # and a curation run still requires both crawl flags
    with pytest.raises(SystemExit):
        curatectl.main(["--out-dir", str(tmp_path / "o")])


# slow: CLI logging surface over the same stage run
@pytest.mark.slow
def test_cli_substring_stage_logs_shuffle_estimate(spark, tmp_path, capsys):
    """r10 VERDICT item 6: enabling the stage must be loud about the
    winnowing shuffle bill (w=8 ≈ 10 bytes per text byte) so a
    default-w production run can't silently 10× its shuffle."""
    import gzip

    from tests.test_curate import _page, _record

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "c.warc.gz").write_bytes(gzip.compress(_record(
        "http://a.com/1",
        _page(["a page with enough plain words to clear the word gate"],
              "One"),
        seq=0,
    )))
    rc = curatectl.main(
        ["--warc-dir", str(d), "--out-dir", str(tmp_path / "o"),
         "--min-words", "8", "--substring-dedup"]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "w=8" in err
    assert "~10.0 bytes shuffled per text byte" in err
    assert "w=35" in err and "SCALE.md" in err


# slow: CLI input-format twin; the WET path is pinned in test_curate/test_warc
@pytest.mark.slow
def test_cli_wet_input_format(spark, tmp_path, capsys):
    """--input-format wet (or [curation] input_format) reaches the WET
    fast path from the CLI — previously curation_stages' WET mode was
    unreachable operationally (review-caught completeness gap)."""
    import gzip

    from tests.test_curate import _wet_crawl

    d = tmp_path / "wet"
    d.mkdir()
    (d / "c.warc.wet.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _wet_crawl())
    )
    out = tmp_path / "corpus"
    rc = curatectl.main(
        ["--warc-dir", str(d), "--out-dir", str(out),
         "--input-format", "wet", "--min-words", "10",
         "--blocklist", "/dev/null", "--report"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # WET runs have no HTML stages in the funnel report
    assert "extracted" not in report["funnel"]
    assert report["n_documents"] > 0
    rows = spark.read.parquet(str(out)).collect()
    assert all(r["title"] is None for r in rows)  # WET carries no markup

    # the TOML key drives the same switch
    cfg = tmp_path / "c.toml"
    cfg.write_text('[curation]\ninput_format = "wet"\n'
                   '[curation.quality_thresholds]\nmin_words = 10\n')
    out2 = tmp_path / "corpus2"
    rc = curatectl.main(
        ["--warc-dir", str(d), "--out-dir", str(out2), "--config", str(cfg)]
    )
    assert rc == 0
    assert spark.read.parquet(str(out2)).count() == len(rows)


# slow: CLI route twin; scan-route parity pinned fast in test_warc_datasource
@pytest.mark.slow
def test_cli_warc_stream_route_and_gates(spark, tmp_path, capsys):
    """--input-format warc-stream drives the streaming-DataSource scan
    (r11 VERDICT item 4) and composes with the novelty + DSIR gate
    knobs (item 7) — the CLI reaches the record-bounded-memory route
    end to end."""
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in CRAWL)
    )
    target = tmp_path / "target.parquet"
    spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",)], "text string"
    ).write.parquet(str(target))
    out_dir = tmp_path / "corpus_stream"
    rc = curatectl.main(
        [
            "--warc-dir", str(warc_dir),
            "--out-dir", str(out_dir),
            "--input-format", "warc-stream",
            "--min-words", "10",
            "--novelty-filter",
            "--novelty-min-permille", "1",
            "--dsir-target", str(target),
            "--report",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["funnel"]["records"] == 11  # stream route scans all
    assert "novelty_filtered" in report["funnel"]
    assert "dsir_selected" in report["funnel"]
    assert (
        report["funnel"]["dsir_selected"]
        <= report["funnel"]["novelty_filtered"]
    )
    assert report["n_documents"] == report["funnel"]["final"] > 0


def test_cli_novelty_threshold_without_stage_fails(tmp_path):
    """--novelty-min-permille without --novelty-filter would silently
    tune nothing — must refuse (the min_quality_prob-sans-model
    contract)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="novelty_min_permille"):
        curatectl.main(
            [
                "--warc-dir", str(tmp_path),
                "--out-dir", str(tmp_path / "o"),
                "--novelty-min-permille", "100",
            ]
        )


def test_cli_heavy_hitters_audit(spark, tmp_path, capsys):
    """--heavy-hitters-permille mines the SHIPPED corpus (r12 VERDICT
    item 4): every reported token's count recomputes exactly from the
    written parquet, shares are true permille of the shipped token
    stream, and the list is descending-count."""
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in CRAWL)
    )
    out_dir = tmp_path / "corpus_hh"
    rc = curatectl.main(
        [
            "--warc-dir", str(warc_dir),
            "--out-dir", str(out_dir),
            "--min-words", "10",
            "--heavy-hitters-permille", "20",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    hh = report["heavy_hitters"]
    assert hh, "fixture corpus repeats words; 20‰ must find some"
    assert len(hh) <= 1000 // 20  # the cardinality bound, by definition
    # exact recount from what shipped
    from collections import Counter

    toks = Counter()
    for r in spark.read.parquet(str(out_dir)).select("text").collect():
        toks.update(r["text"].split(" "))
    n = sum(toks.values())
    want = {t: c for t, c in toks.items() if c * 1000 > n * 20}
    assert {e["token"]: e["cnt"] for e in hh} == want
    cnts = [e["cnt"] for e in hh]
    assert cnts == sorted(cnts, reverse=True)
    assert all(e["permille"] == round(e["cnt"] * 1000 / n, 2) for e in hh)


def test_default_input_format_is_stream(tmp_path):
    """r12 VERDICT item 7: the default scan route is the streaming
    DataSource (2.9x lower scan RSS at funnel wall parity, identical
    output — SCALE.md); binaryFile stays as the explicit 'warc'."""
    import inspect

    from ir_analyses_spark.llm.curate import curation_stages

    sig = inspect.signature(curation_stages)
    assert sig.parameters["input_format"].default == "warc-stream"


def test_cli_heavy_hitters_phi_validated_at_parse_time(tmp_path, capsys):
    """r13 ADVICE 1: an out-of-range PHI must fail at argparse time —
    BEFORE the funnel runs and the export lands — not via
    heavy_hitters()'s post-export ValueError that eats the run's JSON
    report. argparse type errors exit 2 with a usage message."""
    import pytest

    for bad in ("0", "1000", "-5", "2048"):
        with pytest.raises(SystemExit) as ei:
            curatectl.main(
                ["--warc-dir", str(tmp_path), "--out-dir",
                 str(tmp_path / "o"), "--heavy-hitters-permille", bad]
            )
        assert ei.value.code == 2
        err = capsys.readouterr().err
        assert "PHI must be in (0, 1000) permille" in err
    # in-range values still parse (the run itself fails later on the
    # empty warc dir, which is fine — parse acceptance is the contract)
    assert curatectl._phi_permille("20") == 20
    assert curatectl._phi_permille("999") == 999
    assert curatectl._phi_permille("1") == 1


# slow: CLI lifecycle twin of the store-vintage guard pinned in test_substring_queries
@pytest.mark.slow
def test_cli_stale_store_vintage_fails_loudly_force_overrides(
    spark, tmp_path, capsys
):
    """r13 VERDICT item 2, end to end through the CLI: a fingerprint
    store stamped with an older doc-identity rendering vintage (or
    predating the stamp) fails AT LOAD — before the funnel computes
    anything against it — and --force-store-vintage proceeds after the
    operator has verified path-rendering stability."""
    import gzip

    import pytest

    from ir_analyses_spark.llm.substring_dedup import (
        FingerprintStoreIdentityMismatch,
    )
    from tests.test_curate import _page, _record

    store = tmp_path / "fps_store"
    b1 = tmp_path / "crawl1"
    b1.mkdir()
    (b1 / "c.warc.gz").write_bytes(gzip.compress(_record(
        "http://a.com/1",
        _page(["alpha filing with plenty of words to pass the quality"
               " gate and some more padding words"], "One"),
        seq=0,
    )))
    out1 = tmp_path / "corpus1"
    rc = curatectl.main(
        ["--warc-dir", str(b1), "--out-dir", str(out1),
         "--min-words", "8", "--substring-dedup",
         "--substring-store", str(store), "--report"]
    )
    assert rc == 0
    capsys.readouterr()

    # back-stamp the store to a pre-r14 vintage (and strip the crc so
    # the rewrite is readable)
    meta_dir = store / "_store_meta"
    for crc in meta_dir.glob(".*.crc"):
        crc.unlink()
    for p in meta_dir.glob("*.json"):
        row = json.loads(p.read_text().strip())
        row["identity_rendering"] = "csp-2"
        p.write_text(json.dumps(row) + "\n")

    out2 = tmp_path / "corpus2"
    with pytest.raises(FingerprintStoreIdentityMismatch, match="csp-2"):
        curatectl.main(
            ["--warc-dir", str(b1), "--out-dir", str(out2),
             "--min-words", "8", "--substring-dedup",
             "--substring-store", str(store), "--report"]
        )
    # nothing shipped: the refusal happened before the funnel exported
    assert not out2.exists()

    rc = curatectl.main(
        ["--warc-dir", str(b1), "--out-dir", str(out2),
         "--min-words", "8", "--substring-dedup",
         "--substring-store", str(store), "--force-store-vintage",
         "--report"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the forced run proceeded — and the store did its job: the
    # re-crawled page is a cross-batch duplicate of batch 1's export,
    # so first-seen-wins cuts it and nothing new ships
    assert report["n_documents"] == 0


def test_cli_force_store_vintage_requires_store(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="--force-store-vintage requires"):
        curatectl.main(
            ["--warc-dir", str(tmp_path), "--out-dir",
             str(tmp_path / "o"), "--force-store-vintage"]
        )
