"""Batch retrieval primitives: inverted-index build + BM25 scoring.

The index-construction and ranked-retrieval side of a corpus pipeline
(Robertson & Walker SIGIR 1994 / the BM25 of Robertson & Zaragoza
2009, "The Probabilistic Relevance Framework"): build postings over
the documents table and score a fixed query against every document.
Index construction is the canonical big-batch IR job; scoring a query
set against a 100 TB corpus is how retrieval-augmented training data
gets mined.

Float discipline (the `llm/dsir.py` posture): BM25's idf is
transcendental, so it is algebraically rearranged onto INTEGER
arguments —

    idf = ln((N − df + 0.5)/(df + 0.5)) = ln(2N − 2df + 1) − ln(2df + 1)

(two lns of exact int64s — the same IEEE inputs in both engines). The
tf normalization with k1 = 1.2, b = 0.75 is cleared of float
constants by scaling through 10·T (T = total corpus tokens, avgdl =
T/N):

    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
      = 22·tf·T / (10·tf·T + 3·T + 9·dl·N)

— ONE IEEE division of two exact int64 products (bounds: tf ≤ dl,
10·tf·T stays under int64 up to T ≈ 10^15 corpus tokens at dl ≤ 10^3;
past that, rescale the constant pair). The per-term product
idf·tf_component is two identically-computed doubles multiplied once,
then ROUND(·,6) → DECIMAL before the per-doc SUM, so aggregation
order can never move the hash (`ops/helpers.py` discipline).

Scale shape: the (term, df/idf) table is bounded by the QUERY length —
broadcast; document length and corpus totals are one partial-agg pass;
the only doc-cardinality shuffles carry fixed-width (doc_id, tf/dl)
rows. Postings construction shuffles (token, doc, positions-array)
grouped rows — the stopword token's posting string is the documented
hot key of the single-string certificate form
(:func:`inverted_postings`), whose per-token ``collect_list`` carries
unbounded state on one task at corpus scale. The PRODUCTION form is
:func:`inverted_postings_sharded` (r12 VERDICT item 2): postings are
segmented by doc_id range — ``segment = doc_id div seg_width`` — so
every aggregation key is (token, segment) and per-key state is bounded
by the segment's document population, whatever one token's global df.
A reader walks a token's list in global doc order by scanning segments
ascending (range segmentation preserves doc order across segments,
which modulo sharding would not). For sequential doc_ids ``seg_width``
bounds docs-per-segment directly; for hashed 64-bit doc_ids
(``xxhash64`` identity in the curation funnel) pick
``seg_width = 2^64 / S`` — uniform hashes populate the S value-range
segments evenly, and ``div``'s truncate-toward-zero matches DuckDB
``//`` exactly even on negative ids (pinned in tests).

Reference parity: the reference app has no retrieval surface at all
(pandas keyword filters at best); this module is LLM-pipeline
capability closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

#: fixed certificate query — three mid-frequency corpus terms, so
#: matched/unmatched docs, multi-term and single-term matches all
#: exist at every correctness SF (pinned in tests/test_retrieval.py)
_QUERY = ("customer", "window", "filter")
_DEC = "decimal(20,6)"


#: int64 ceiling for the rescaled-BM25 overflow guard below
_I64_MAX = (1 << 63) - 1


def bm25_scores(docs: DataFrame, query_terms=_QUERY, _i64=_I64_MAX) -> DataFrame:
    """(doc_id, n_terms, score) for every doc matching ≥ 1 query term;
    k1 = 1.2, b = 0.75 via the integer-scaled rational form above.

    Overflow guard (r12 ADVICE): past the int64 bound Spark's non-ANSI
    arithmetic silently WRAPS ``10·tf·t_tokens`` while DuckDB promotes
    to HUGEINT — the engines would diverge silently at exactly the
    scale this module advertises. The 1-row totals frame therefore
    checks ``23·max_dl·t_tokens ≤ int64`` (a sufficient bound for both
    the numerator ``22·tf·T``, tf ≤ dl ≤ max_dl, and the denominator
    ``10·tf·T + 3·T + 9·dl·N ≤ 22·max_dl·T`` since N ≤ T), evaluated
    by integer division so the CHECK itself cannot wrap; exceeding it
    raises instead of scoring wrapped. ``_i64`` exists only so tests
    can shrink the ceiling and prove the guard fires."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("t_tokens"),
        F.max("dl").alias("max_dl"),
    ).select(
        "n_docs",
        F.when(
            F.col("t_tokens")
            <= F.expr(f"({_i64} div 23) div max_dl"),
            F.col("t_tokens"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "bm25_scores: corpus exceeds the int64 rescale "
                        "bound (23 * max_dl * t_tokens > 2^63): t_tokens="
                    ),
                    F.col("t_tokens").cast("string"),
                    F.lit(", max_dl="),
                    F.col("max_dl").cast("string"),
                    F.lit(
                        "; shard the corpus or rescale the constant "
                        "pair (module docstring)"
                    ),
                )
            )
        )
        .alias("t_tokens"),
    )
    tf = (
        toks.filter(F.col("w").isin(*query_terms))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(totals))
        .select(
            "w",
            (
                F.log(2 * F.col("n_docs") - 2 * F.col("df") + 1)
                - F.log(2 * F.col("df") + 1)
            ).alias("idf"),
        )
    )
    term_scores = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "w")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.col("idf")
                * (
                    (22 * F.col("tf") * F.col("t_tokens"))
                    / (
                        10 * F.col("tf") * F.col("t_tokens")
                        + 3 * F.col("t_tokens")
                        + 9 * F.col("dl") * F.col("n_docs")
                    )
                ),
                6,
            )
            .cast(_DEC)
            .alias("s"),
        )
    )
    return term_scores.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        # exact decimal sum, then one representational cast (the
        # llm/dsir.py logweight convention)
        F.sum("s").cast("double").alias("score"),
    )


def bm25_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: BM25 of the fixed certificate query over the
    documents table."""
    return bm25_scores(load_table(spark, "documents", sf_dir))


def inverted_postings(docs: DataFrame) -> DataFrame:
    """(token, df, total_tf, postings) — postings is
    ``doc:pos,pos;doc:pos`` with 1-based positions, docs ascending,
    positions ascending: the canonical positional index entry, built
    with two grouped aggregations (per (token, doc) position lists,
    then per token)."""
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("p0", "w"),
    ).select("doc_id", "w", (F.col("p0") + 1).alias("p"))
    per_doc = pos.groupBy("w", "doc_id").agg(
        F.sort_array(F.collect_list("p")).alias("ps"),
        F.count(F.lit(1)).alias("tf"),
    )
    entries = per_doc.select(
        "w",
        "tf",
        "doc_id",
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.array_join(
                F.transform("ps", lambda x: x.cast("string")), ","
            ),
        ).alias("entry"),
    )
    return (
        entries.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                    lambda s: s["entry"],
                ),
                ";",
            ).alias("postings"),
        )
        .withColumnRenamed("w", "token")
    )


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: positional postings over the documents table."""
    return inverted_postings(load_table(spark, "documents", sf_dir))


#: default doc_ids-per-segment (by doc_id VALUE range) for the sharded
#: index — at the correctness SFs (sequential ids: 500 docs at sf0.01,
#: 5000 at sf0.1) this yields 2 / 20 segments, so multi-segment tokens,
#: single-segment tokens, and segment-boundary splits all exist in
#: every driver window (pinned in tests/test_retrieval.py)
_SEG_WIDTH = 256


def inverted_postings_sharded(
    docs: DataFrame, seg_width: int = _SEG_WIDTH
) -> DataFrame:
    """(token, segment, df_seg, total_tf, postings) — the scale-safe
    production twin of :func:`inverted_postings` (its oracle-exact
    certificate): identical entry encoding, but postings are segmented
    by doc_id range (``segment = doc_id div seg_width``), so the final
    aggregation groups on (token, segment) and NO key ever aggregates
    one token's full corpus-wide postings. Per-key state is bounded by
    the segment population; a stopword's index entry is many bounded
    rows instead of one multi-GB string built on one straggler task.
    Concatenating a token's ``postings`` over its segments ascending
    reproduces the certificate's string byte-for-byte (pinned in
    tests)."""
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("p0", "w"),
    ).select("doc_id", "w", (F.col("p0") + 1).alias("p"))
    per_doc = pos.groupBy("w", "doc_id").agg(
        F.sort_array(F.collect_list("p")).alias("ps"),
        F.count(F.lit(1)).alias("tf"),
    )
    entries = per_doc.select(
        "w",
        "tf",
        "doc_id",
        F.expr(f"doc_id div {int(seg_width)}").alias("seg"),
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.array_join(
                F.transform("ps", lambda x: x.cast("string")), ","
            ),
        ).alias("entry"),
    )
    return (
        entries.groupBy("w", "seg")
        .agg(
            F.count(F.lit(1)).alias("df_seg"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                    lambda s: s["entry"],
                ),
                ";",
            ).alias("postings"),
        )
        .withColumnRenamed("w", "token")
        .withColumnRenamed("seg", "segment")
    )


def inverted_index_postings_sharded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry entry: segmented positional postings over the documents
    table (the production form; ``inverted_index_postings`` is its
    single-string certificate)."""
    return inverted_postings_sharded(load_table(spark, "documents", sf_dir))


_Q_SQL = ", ".join(f"'{t}'" for t in _QUERY)

BM25_SCORE_DOCS_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
totals AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS t_tokens FROM dl),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM toks
  WHERE w IN ({_Q_SQL}) GROUP BY doc_id, w
),
idf AS (
  SELECT w, LN(2 * t.n_docs - 2 * df + 1) - LN(2 * df + 1) AS idf
  FROM (SELECT w, COUNT(*) AS df FROM tf GROUP BY w), totals t
),
term_scores AS (
  SELECT tf.doc_id,
         CAST(ROUND(idf.idf * (
             (22 * tf.tf * t.t_tokens)
             / (10 * tf.tf * t.t_tokens + 3 * t.t_tokens
                + 9 * dl.dl * t.n_docs)
         ), 6) AS DECIMAL(20,6)) AS s
  FROM tf JOIN dl USING (doc_id) JOIN idf USING (w), totals t
)
SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(s) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
"""

INVERTED_INDEX_POSTINGS_SQL = """
WITH pos AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w, CAST(i AS INT) AS p
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
       UNNEST(range(1, LEN(w) + 1)) AS t(i)
),
per_doc AS (
  SELECT w, doc_id,
         doc_id || ':' || STRING_AGG(p, ',' ORDER BY p) AS entry,
         COUNT(*) AS tf
  FROM pos GROUP BY w, doc_id
)
SELECT w AS token, COUNT(*) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       STRING_AGG(entry, ';' ORDER BY doc_id) AS postings
FROM per_doc GROUP BY w
"""

INVERTED_INDEX_POSTINGS_SHARDED_SQL = f"""
WITH pos AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w, CAST(i AS INT) AS p
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
       UNNEST(range(1, LEN(w) + 1)) AS t(i)
),
per_doc AS (
  SELECT w, doc_id, doc_id // {_SEG_WIDTH} AS seg,
         doc_id || ':' || STRING_AGG(p, ',' ORDER BY p) AS entry,
         COUNT(*) AS tf
  FROM pos GROUP BY w, doc_id
)
SELECT w AS token, seg AS segment, COUNT(*) AS df_seg,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       STRING_AGG(entry, ';' ORDER BY doc_id) AS postings
FROM per_doc GROUP BY w, seg
"""

QUERIES = {
    "bm25_score_docs": bm25_score_docs,
    "inverted_index_postings": inverted_index_postings,
    "inverted_index_postings_sharded": inverted_index_postings_sharded,
}
ORACLES = {
    "bm25_score_docs": BM25_SCORE_DOCS_SQL,
    "inverted_index_postings": INVERTED_INDEX_POSTINGS_SQL,
    "inverted_index_postings_sharded": INVERTED_INDEX_POSTINGS_SHARDED_SQL,
}
