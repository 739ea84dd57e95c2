"""Tokenizer APPLICATION — encode the corpus with trained BPE merges
(SURVEY §2B LLM ext: token counting graduates from the whitespace/regex
heuristics in ``textstats.py`` to a learned subword vocabulary).

Own module (not ``textstats.py``) for the same evidence-ledger reason as
``pq.py``: a new operator in a new module leaves the six r5-certified
textstats queries' green rows current. The trainer is REUSED by import —
``textstats.bpe_train_merges`` — so the merge table this encoder applies
is exactly the one the certified trainer emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from . import textstats


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the 3 trained BPE merges and report
    per-document token statistics: whitespace token count, post-merge BPE
    symbol count, and character count — the numbers a training-data
    pipeline budgets sequence packing and cost with. All-integer output,
    so the oracle hash is arithmetic-free.

    Scale shape — the tokenizer-apply trick: merges are applied to the
    DISTINCT-token vocabulary (|V| rows), never to the corpus; documents
    then resolve token → symbol count through a broadcast join of that
    encoded vocabulary, and the per-doc rollup is one map-side-combined
    shuffle on doc_id. The corpus text is scanned, exploded, and
    aggregated exactly once — the same reason real tokenizers cache
    per-word encodings. Merge application itself is the trainer's
    paren-wrapped literal replace (``(a)(b)`` → ``(ab)``), which is BPE's
    greedy leftmost merge with no lookaround regex — bit-identical in
    both engines (see ``textstats.bpe_train_merges``).

    r14 (guide §1.2): the trainer's loop already materializes the
    vocabulary WITH every merge applied (its per-round working frame),
    so the encoder consumes that frame directly instead of re-exploding
    the corpus into a second distinct-vocabulary shuffle and replaying
    all merges on it — the trainer's ``seqs`` after round k IS the
    encoded vocabulary by construction (same token set: both derive
    from the same whitespace split; same seq: identical literal
    replaces in identical order)."""
    _, seqs = textstats._bpe_train(spark, sf_dir, need_final_seqs=True)
    docs = load_table(spark, "documents", sf_dir)
    enc = seqs.select(
        "token",
        F.size(
            F.split(F.trim(F.col("seq"), F.lit("()")), r"\)\(")
        ).cast("long").alias("n_sym"),
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    return (
        toks.join(F.broadcast(enc), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_sym").alias("n_bpe_symbols"),
            F.sum(F.length("token")).alias("n_chars"),
        )
    )


def _enc_round_sql(k: int) -> str:
    """One oracle merge round for the ENCODER. Same pairs/argmax CTEs as
    ``textstats._bpe_round_sql`` but the merge application LEFT JOINs the
    (possibly EMPTY) ``best{k}`` row: a corpus that trains fewer than 3
    merges has an empty ``best{k}``, and the trainer's comma join would
    annihilate ``seqs{k}`` — emptying the encoder's whole output while
    the Spark side correctly applies the fewer merges (review-caught
    divergence). The trainer's own SQL tolerates the empty round because
    it only UNIONs ``best{k}`` rows; the encoder consumes ``seqs3`` and
    must carry sequences through merge-less rounds unchanged."""
    return f"""
pairs{k} AS (
  SELECT l[i] AS a, l[i+1] AS b, CAST(SUM(cnt) AS BIGINT) AS pc
  FROM (SELECT cnt, string_split(trim(seq, '()'), ')(') AS l FROM seqs{k - 1}) s,
       UNNEST(range(1, len(l))) AS t(i)
  GROUP BY 1, 2
),
best{k} AS (SELECT a, b, pc FROM pairs{k} ORDER BY pc DESC, a, b LIMIT 1),
seqs{k} AS (
  SELECT token, cnt,
         CASE WHEN best{k}.a IS NULL THEN seq
              ELSE replace(seq, '(' || best{k}.a || ')(' || best{k}.b || ')',
                           '(' || best{k}.a || best{k}.b || ')')
         END AS seq
  FROM seqs{k - 1} LEFT JOIN best{k} ON TRUE
)"""


BPE_ENCODE_CORPUS_SQL = f"""
WITH vocab AS (
  SELECT token, COUNT(*) AS cnt FROM (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
  ) GROUP BY token
),
seqs0 AS (
  SELECT token, cnt, regexp_replace(token, '(.)', '(\\1)', 'g') AS seq
  FROM vocab
),{",".join(_enc_round_sql(k) for k in (1, 2, 3))},
enc AS (
  SELECT token,
         CAST(len(string_split(trim(seq, '()'), ')(')) AS BIGINT) AS n_sym
  FROM seqs3
),
toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(e.n_sym) AS BIGINT) AS n_bpe_symbols,
       CAST(SUM(length(t.token)) AS BIGINT) AS n_chars
FROM toks t JOIN enc e ON t.token = e.token
GROUP BY t.doc_id
"""

QUERIES = {
    "bpe_encode_corpus": bpe_encode_corpus,
}

ORACLES = {
    "bpe_encode_corpus": BPE_ENCODE_CORPUS_SQL,
}
