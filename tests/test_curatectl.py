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
