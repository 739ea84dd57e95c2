"""retrievectl.py e2e: build the stored index over a corpus parquet,
answer phrase + batched top-k from storage, and fail loudly on the
rejection paths (r13 VERDICT item 6)."""

from __future__ import annotations

import json

import pytest

import retrievectl
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("retr_corpus") / "corpus"
    (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .write.mode("overwrite")
        .parquet(str(d))
    )
    return str(d)


def test_cli_build_phrase_topk_end_to_end(spark, corpus_dir, tmp_path, capsys):
    idx = str(tmp_path / "ridx")
    # sequential small doc_ids → explicit width (the help's guidance)
    rc = retrievectl.main(
        ["build", "--corpus", corpus_dir, "--index-dir", idx,
         "--seg-width", "256"]
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_docs"] == 500 and built["postings_rows"] > 0
    assert built["seg_width"] == 256

    rc = retrievectl.main(
        ["phrase", "--index-dir", idx, "--terms", "part filter"]
    )
    assert rc == 0
    ph = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ph["matched_docs"] > 0
    assert ph["rows_printed"] == min(ph["matched_docs"], 100)
    # parity with the in-engine certificate form
    from ir_analyses_spark.llm.retrieval import (
        inverted_postings_sharded,
        phrase_search,
    )

    docs = spark.read.parquet(corpus_dir)
    want = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(
            inverted_postings_sharded(docs, 256), "part", "filter"
        ).collect()
    }
    assert {r["doc_id"]: r["n_occurrences"] for r in ph["rows"]} == want

    rc = retrievectl.main(
        ["topk", "--index-dir", idx,
         "--query", "customer filter", "--query", "window join",
         "--k", "5"]
    )
    assert rc == 0
    tk = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert tk["queries"] == {"1": ["customer", "filter"],
                             "2": ["window", "join"]}
    assert len(tk["rows"]) == 10  # 2 queries x k=5
    # rows come back ranked 1..k per query with descending scores
    by_q: dict = {}
    for r in tk["rows"]:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert [r["rank"] for r in rows] == list(range(1, 6))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # parity with the from-text form
    from ir_analyses_spark.llm.retrieval import bm25_topk

    want_tk = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_topk(
            docs, {1: ("customer", "filter"), 2: ("window", "join")}, k=5
        ).collect()
    )
    got_tk = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in tk["rows"]
    )
    assert got_tk == want_tk


def test_cli_rejection_paths(corpus_dir, tmp_path, capsys):
    # missing index → exit 2, loud message
    rc = retrievectl.main(
        ["phrase", "--index-dir", str(tmp_path / "nope"),
         "--terms", "a b"]
    )
    assert rc == 2
    assert "no retrieval index" in capsys.readouterr().err
    # corpus without the contract columns → exit 2 before any build
    bad = tmp_path / "bad_corpus"
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    bad.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"body": ["x"]})),
        str(bad / "p.parquet"),
    )
    rc = retrievectl.main(
        ["build", "--corpus", str(bad), "--index-dir", str(tmp_path / "i")]
    )
    assert rc == 2
    assert "lacks columns" in capsys.readouterr().err
    # phrase wants at least two tokens (a 1-token "phrase" is a df
    # lookup, not a phrase); three tokens is a valid n-phrase
    idx = str(tmp_path / "ridx2")
    assert retrievectl.main(
        ["build", "--corpus", corpus_dir, "--index-dir", idx,
         "--seg-width", "256"]
    ) == 0
    capsys.readouterr()
    rc = retrievectl.main(
        ["phrase", "--index-dir", idx, "--terms", "one"]
    )
    assert rc == 2
    assert "at least two" in capsys.readouterr().err
    rc = retrievectl.main(
        ["phrase", "--index-dir", idx, "--terms", "data group group"]
    )
    assert rc == 0
    tri = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert tri["matched_docs"] > 0
    rc = retrievectl.main(
        ["phrase", "--index-dir", idx, "--terms", "a b", "--limit", "0"]
    )
    assert rc == 2
    assert "--limit" in capsys.readouterr().err
    rc = retrievectl.main(
        ["topk", "--index-dir", idx, "--query", "  "]
    )
    assert rc == 2
    assert "at least one term" in capsys.readouterr().err


def test_cli_append_two_batch_flow(spark, corpus_dir, tmp_path, capsys):
    """retrievectl append: two-batch incremental growth through the
    CLI equals the one-shot build (n_docs/t_tokens/postings_rows all
    converge to the full corpus's)."""
    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    docs = spark.read.parquet(corpus_dir)
    docs.filter("doc_id % 2 = 0").write.parquet(b1)
    docs.filter("doc_id % 2 = 1").write.parquet(b2)
    idx, full = str(tmp_path / "inc"), str(tmp_path / "full")
    assert retrievectl.main(
        ["build", "--corpus", b1, "--index-dir", idx, "--seg-width", "256"]
    ) == 0
    capsys.readouterr()
    assert retrievectl.main(
        ["append", "--corpus", b2, "--index-dir", idx]
    ) == 0
    inc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert retrievectl.main(
        ["build", "--corpus", corpus_dir, "--index-dir", full,
         "--seg-width", "256"]
    ) == 0
    one = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("n_docs", "t_tokens", "max_dl", "postings_rows", "seg_width"):
        assert inc[k] == one[k], k
    # re-running the same append refuses (duplicate doc_ids), exit 2
    rc = retrievectl.main(["append", "--corpus", b2, "--index-dir", idx])
    assert rc == 2
    assert "already indexed" in capsys.readouterr().err


def test_cli_stats_surface(spark, corpus_dir, tmp_path, capsys):
    """retrievectl stats: the frozen meta, live counts, and epoch
    ledger — recomputed here from the index itself."""
    idx = str(tmp_path / "ridx")
    assert retrievectl.main(
        ["build", "--corpus", corpus_dir, "--index-dir", idx,
         "--seg-width", "256"]
    ) == 0
    capsys.readouterr()
    assert retrievectl.main(["stats", "--index-dir", idx]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    postings = spark.read.parquet(f"{idx}/postings")
    assert st["n_docs"] == 500
    assert st["live_rows"] == st["postings_rows"] == postings.count()
    assert st["n_tokens"] == postings.select("token").distinct().count()
    assert st["n_segments"] == postings.select("segment").distinct().count()
    assert st["postings_bytes"] > 0 and st["doclens_bytes"] > 0
    assert st["n_applied_batches"] == 0  # batch-built, not streamed
    # payload distribution + segment-skew observability (r14 s2)
    assert (
        st["postings_chars_p50"]
        <= st["postings_chars_p99"]
        <= st["max_postings_chars"]
    )
    assert st["segment_skew"] >= 1.0
    pairs = {
        r["segment"]: r["pairs"]
        for r in postings.groupBy("segment")
        .agg(F.sum("df_seg").alias("pairs"))
        .collect()
    }
    assert st["max_segment_pairs"] == max(pairs.values())
    # a streamed index reports its epochs
    from ir_analyses_spark.llm.retrieval import retrieval_index_stats
    from ir_analyses_spark.llm.retrieval_stream import index_stream_sink

    idx2 = str(tmp_path / "ridx_stream")
    sink = index_stream_sink(idx2, seg_width=256)
    docs = spark.read.parquet(corpus_dir)
    sink(docs.filter("doc_id % 2 = 0"), 0)
    sink(docs.filter("doc_id % 2 = 1"), 1)
    st2 = retrieval_index_stats(spark, idx2)
    assert st2["n_applied_batches"] == 2 and st2["n_docs"] == 500


def test_cli_boolean_kwic_proximity_queries(spark, corpus_dir, tmp_path, capsys):
    """The three r14 query subcommands answer from storage and agree
    with the in-engine certificate forms."""
    idx = str(tmp_path / "ridx")
    assert retrievectl.main(
        ["build", "--corpus", corpus_dir, "--index-dir", idx,
         "--seg-width", "256"]
    ) == 0
    capsys.readouterr()

    from ir_analyses_spark.llm.retrieval import (
        boolean_search,
        inverted_postings_sharded,
        kwic_snippets,
        proximity_search,
    )

    docs = spark.read.parquet(corpus_dir)
    index = inverted_postings_sharded(docs, 256)

    assert retrievectl.main(
        ["boolean", "--index-dir", idx, "--must", "customer filter",
         "--must-not", "dup"]
    ) == 0
    bl = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = {
        r["doc_id"]: r["tf_sum"]
        for r in boolean_search(
            index, ("customer", "filter"), ("dup",)
        ).collect()
    }
    assert bl["matched_docs"] == len(want)
    assert all(want[r["doc_id"]] == r["tf_sum"] for r in bl["rows"])

    assert retrievectl.main(
        ["kwic", "--index-dir", idx, "--corpus", corpus_dir,
         "--term", "line", "--width", "4"]
    ) == 0
    kw = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want_kw = {
        r["doc_id"]: (r["p_first"], r["snippet"])
        for r in kwic_snippets(docs, index, "line", 4).collect()
    }
    assert kw["matched_docs"] == len(want_kw)
    assert all(
        want_kw[r["doc_id"]] == (r["p_first"], r["snippet"])
        for r in kw["rows"]
    )

    assert retrievectl.main(
        ["proximity", "--index-dir", idx, "--terms", "part scan",
         "--window", "6"]
    ) == 0
    px = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want_px = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_search(index, "part", "scan", 6).collect()
    }
    assert px["matched_docs"] == len(want_px)
    assert all(
        want_px[r["doc_id"]] == (r["n_pairs"], r["min_dist"])
        for r in px["rows"]
    )


def test_cli_vocab_prefix(spark, corpus_dir, tmp_path, capsys):
    """vocab answers from storage and agrees with the in-engine form;
    an empty prefix is rejected before any scan."""
    idx = str(tmp_path / "ridx")
    assert retrievectl.main(
        ["build", "--corpus", corpus_dir, "--index-dir", idx,
         "--seg-width", "256"]
    ) == 0
    capsys.readouterr()
    assert retrievectl.main(
        ["vocab", "--index-dir", idx, "--prefix", "s"]
    ) == 0
    vb = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    from ir_analyses_spark.llm.retrieval import (
        inverted_postings_sharded,
        vocab_prefix,
    )

    docs = spark.read.parquet(corpus_dir)
    want = {
        r["token"]: (r["df"], r["total_tf"])
        for r in vocab_prefix(
            inverted_postings_sharded(docs, 256), "s"
        ).collect()
    }
    assert vb["matched_tokens"] == len(want)
    assert all(
        want[r["token"]] == (r["df"], r["total_tf"]) for r in vb["rows"]
    )
    assert retrievectl.main(
        ["vocab", "--index-dir", idx, "--prefix", ""]
    ) == 2
    assert "empty prefix" in capsys.readouterr().err


# slow: CLI lifecycle twin of the oracle-checked delete/vacuum path
@pytest.mark.slow
def test_cli_delete_vacuum_flow(spark, corpus_dir, tmp_path, capsys):
    """delete masks immediately (phrase result shrinks), marker replay
    is a no-op, vacuum reclaims and clears, and the rejection paths
    (both/neither id source, non-integer ids) exit 2."""
    idx = str(tmp_path / "ridx")
    assert retrievectl.main(
        ["build", "--corpus", corpus_dir, "--index-dir", idx,
         "--seg-width", "256"]
    ) == 0
    capsys.readouterr()

    assert retrievectl.main(
        ["phrase", "--index-dir", idx, "--terms", "part filter"]
    ) == 0
    before = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    victims = [str(r["doc_id"]) for r in before["rows"][:2]]

    assert retrievectl.main(
        ["delete", "--index-dir", idx, "--doc-ids", ",".join(victims),
         "--marker", "takedown-1"]
    ) == 0
    d1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d1["deleted"] == 2 and d1["n_tombstones"] == 2

    assert retrievectl.main(
        ["delete", "--index-dir", idx, "--doc-ids", ",".join(victims),
         "--marker", "takedown-1"]
    ) == 0
    d2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d2["deleted"] == 0 and d2.get("replayed_noop")

    assert retrievectl.main(
        ["phrase", "--index-dir", idx, "--terms", "part filter"]
    ) == 0
    after = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert after["matched_docs"] == before["matched_docs"] - 2
    gone = {int(v) for v in victims}
    assert not gone & {r["doc_id"] for r in after["rows"]}

    assert retrievectl.main(["stats", "--index-dir", idx]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["n_tombstones"] == 2 and st["n_live_docs"] == 498

    assert retrievectl.main(["vacuum", "--index-dir", idx]) == 0
    vc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert vc["removed_docs"] == 2 and vc["n_docs"] == 498

    assert retrievectl.main(["stats", "--index-dir", idx]) == 0
    st2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st2["n_tombstones"] == 0 and st2["n_docs"] == 498

    # the large-batch route: ids from a parquet file
    ids_pq = str(tmp_path / "ids")
    spark.createDataFrame(
        [(r["doc_id"],) for r in before["rows"][2:4]], "doc_id long"
    ).write.parquet(ids_pq)
    assert retrievectl.main(
        ["delete", "--index-dir", idx, "--ids-parquet", ids_pq]
    ) == 0
    d3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d3["deleted"] == 2 and d3["n_tombstones"] == 2

    # rejections: both/neither source, non-integer ids, bad must-lists
    for argv in (
        ["delete", "--index-dir", idx],
        ["delete", "--index-dir", idx, "--doc-ids", "1",
         "--ids-parquet", corpus_dir],
        ["delete", "--index-dir", idx, "--doc-ids", "1,x"],
        ["boolean", "--index-dir", idx, "--must", ""],
        ["boolean", "--index-dir", idx, "--must", "part",
         "--must-not", "part"],
    ):
        assert retrievectl.main(argv) == 2, argv
        capsys.readouterr()
