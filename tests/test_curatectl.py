"""curatectl.py e2e: the CLI writes the curated corpus and reports the
funnel, reusing the synthesized crawl from test_curate."""

from __future__ import annotations

import gzip
import json

import curatectl
from tests.test_curate import CRAWL


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
