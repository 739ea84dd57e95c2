"""BPE corpus encoding invariants (llm/tokenize.py) beyond the registry
oracle check."""

from __future__ import annotations

from ir_analyses_spark.llm.textstats import bpe_train_merges
from ir_analyses_spark.llm.tokenize import bpe_encode_corpus

SF = "/root/testdata/sf0.001"


def test_bpe_encode_bounds_and_actual_compression(spark):
    """Per-doc: every token is at least one symbol (n_bpe_symbols ≥
    n_tokens) and a symbol is at least one char (n_bpe_symbols ≤
    n_chars). Corpus-wide: the trained merges must FIRE — total symbols
    strictly below total chars — the vacuity guard against an empty or
    never-matching merge table silently degrading the encoder to
    char-level (where n_bpe_symbols == n_chars everywhere)."""
    rows = bpe_encode_corpus(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_tokens"] <= r["n_bpe_symbols"] <= r["n_chars"], r
    assert sum(r["n_bpe_symbols"] for r in rows) < sum(
        r["n_chars"] for r in rows
    )


def test_bpe_encode_matches_independent_python_encoder(spark):
    """Differential check against a from-scratch Python encoder: apply
    the trained merge table to every token with Python's own
    ``str.replace`` — which is the same greedy leftmost NON-OVERLAPPING
    literal replace as the engine's paren-wrapped merge (so "aaa" under
    merge (a,a) becomes "(aa)(a)": 1 merge, not the 2 the raw pair count
    would suggest) — and recompute every document's totals. A drifting
    encoder (merge order, overlapping-replace semantics, vocab-vs-corpus
    application) diverges from this."""
    import duckdb

    merges = [
        (r["left_sym"], r["right_sym"])
        for r in sorted(bpe_train_merges(spark, SF).collect(),
                        key=lambda r: r["round"])
    ]
    assert 1 <= len(merges) <= 3
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    enc_cache: dict[str, int] = {}

    def n_sym(token: str) -> int:
        if token not in enc_cache:
            seq = "".join(f"({c})" for c in token)
            for a, b in merges:
                seq = seq.replace(f"({a})({b})", f"({a}{b})")
            enc_cache[token] = seq.count("(") if token else 1
        return enc_cache[token]

    expected = {
        doc_id: (
            len(text.split(" ")),
            sum(n_sym(t) for t in text.split(" ")),
            sum(len(t) for t in text.split(" ")),
        )
        for doc_id, text in docs
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_symbols"], r["n_chars"])
        for r in bpe_encode_corpus(spark, SF).collect()
    }
    assert got == expected


def test_bpe_encode_oracle_survives_fewer_than_three_merges(spark, tmp_path):
    """Review-caught oracle divergence: a corpus that trains fewer than 3
    merges has an EMPTY best{k} for the later rounds; the trainer-style
    comma join would annihilate seqs{k} and return zero encoder rows
    while the Spark side correctly applies the fewer merges. The
    encoder's oracle carries sequences through merge-less rounds via
    LEFT JOIN — prove Spark == oracle on exactly such a corpus."""
    import duckdb
    import pandas as pd

    from ir_analyses_spark.registry import all_oracles

    # 'ab' fully merges in round 1 ('(a)(b)' -> '(ab)'); rounds 2-3 find
    # no pair and the trainer breaks after ONE merge
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["ab ab ab", "ab"]})
    sf_dir = str(tmp_path)
    docs.to_parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train_merges(spark, sf_dir).collect()
    assert len(merges) == 1  # the scenario under test

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_symbols"], r["n_chars"])
        for r in bpe_encode_corpus(spark, sf_dir).collect()
    }
    assert got == {1: (3, 3, 6), 2: (1, 1, 2)}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]))
        for r in con.execute(all_oracles()["bpe_encode_corpus"]).fetchall()
    }
    assert oracle == got
