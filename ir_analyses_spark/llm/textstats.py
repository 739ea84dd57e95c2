"""Text analysis for training-data pipelines (SURVEY §2B LLM ext):
language-ID heuristic, quality scoring, token counting, document
fingerprinting — all native column expressions over the `documents` table,
one scan each, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from ..ops.helpers import local_df
from .helpers_sql import STOPWORD_PATTERN

_PUNCT = r"[.,;:!?]"
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char statistics (§2B token counting): whitespace
    words, BPE-ish regex tokens, punctuation count, avg word length."""
    docs = load_table(spark, "documents", sf_dir)
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        "source",
        F.length("text").alias("chars"),
        F.size(words).alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_ISH), F.lit(0))).alias(
            "n_tokens"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_PUNCT), F.lit(0))).alias("n_punct"),
        (
            (F.length("text") - F.size(words) + 1).cast("double") / F.size(words)
        ).alias("avg_word_len"),
    )


TEXT_STATS_SQL = rf"""
SELECT doc_id, source,
       LENGTH(text) AS chars,
       CAST(LENGTH(string_split(text, ' ')) AS INT) AS n_words,
       CAST(LENGTH(regexp_extract_all(text, '{_BPE_ISH}')) AS INT) AS n_tokens,
       CAST(LENGTH(regexp_extract_all(text, '{_PUNCT}')) AS INT) AS n_punct,
       CAST(LENGTH(text) - LENGTH(string_split(text, ' ')) + 1 AS DOUBLE)
           / LENGTH(string_split(text, ' ')) AS avg_word_len
FROM documents
"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (§2B language-ID): English stopword density.

    ratio = en-stopword hits / words; guess 'en' above 2%. Emits the guess
    next to the labeled `lang` column with an agreement flag — the shape a
    corpus-filtering pipeline uses to quarantine mislabeled text.
    """
    docs = load_table(spark, "documents", sf_dir)
    words = F.size(F.split("text", " "))
    hits = F.size(F.regexp_extract_all("text", F.lit(STOPWORD_PATTERN), F.lit(0)))
    ratio = hits.cast("double") / words
    guess = F.when(ratio > 0.02, "en").otherwise("other")
    return docs.select(
        "doc_id",
        "lang",
        hits.alias("stopword_hits"),
        ratio.alias("stopword_ratio"),
        guess.alias("lang_guess"),
        (guess == F.col("lang")).alias("agrees"),
    )


LANGUAGE_ID_SQL = f"""
SELECT doc_id, lang,
       CAST(LENGTH(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS INT)
           AS stopword_hits,
       CAST(LENGTH(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS DOUBLE)
           / LENGTH(string_split(text, ' ')) AS stopword_ratio,
       CASE WHEN CAST(LENGTH(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS DOUBLE)
                 / LENGTH(string_split(text, ' ')) > 0.02
            THEN 'en' ELSE 'other' END AS lang_guess,
       (CASE WHEN CAST(LENGTH(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS DOUBLE)
                  / LENGTH(string_split(text, ' ')) > 0.02
             THEN 'en' ELSE 'other' END) = lang AS agrees
FROM documents
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (§2B quality): length band, punctuation and
    digit ratios, stopword density → composite score + keep/drop flag.
    The filter shape every pretraining pipeline runs before tokenization."""
    docs = load_table(spark, "documents", sf_dir)
    n_chars = F.length("text")
    words = F.size(F.split("text", " "))
    punct_ratio = (
        F.size(F.regexp_extract_all("text", F.lit(_PUNCT), F.lit(0))).cast("double")
        / n_chars
    )
    digit_ratio = (
        F.size(F.regexp_extract_all("text", F.lit("[0-9]"), F.lit(0))).cast("double")
        / n_chars
    )
    stop_ratio = (
        F.size(
            F.regexp_extract_all("text", F.lit(STOPWORD_PATTERN), F.lit(0))
        ).cast("double")
        / words
    )
    length_ok = (n_chars >= 100) & (n_chars <= 20000)
    # integer tenths, divided once: 0.4+0.2 in binary floats is 0.6000…01,
    # and engines disagree on literal types — integer arithmetic doesn't
    tenths = (
        F.when(length_ok, F.lit(4)).otherwise(F.lit(0))
        + F.when(punct_ratio < 0.1, F.lit(2)).otherwise(F.lit(0))
        + F.when(digit_ratio < 0.2, F.lit(2)).otherwise(F.lit(0))
        + F.when(stop_ratio > 0.01, F.lit(2)).otherwise(F.lit(0))
    )
    return docs.select(
        "doc_id",
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stopword_ratio"),
        (tenths.cast("double") / 10.0).alias("quality"),
        (tenths >= 6).alias("keep"),
    )


QUALITY_SCORE_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CAST(LENGTH(regexp_extract_all(text, '{_PUNCT}')) AS DOUBLE)
             / LENGTH(text) AS punct_ratio,
         CAST(LENGTH(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             / LENGTH(text) AS digit_ratio,
         CAST(LENGTH(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS DOUBLE)
             / LENGTH(string_split(text, ' ')) AS stopword_ratio,
         LENGTH(text) BETWEEN 100 AND 20000 AS length_ok
  FROM documents
)
SELECT doc_id, punct_ratio, digit_ratio, stopword_ratio,
       CAST(CASE WHEN length_ok THEN 4 ELSE 0 END
        + CASE WHEN punct_ratio < 0.1 THEN 2 ELSE 0 END
        + CASE WHEN digit_ratio < 0.2 THEN 2 ELSE 0 END
        + CASE WHEN stopword_ratio > 0.01 THEN 2 ELSE 0 END AS DOUBLE) / 10.0
           AS quality,
       (CASE WHEN length_ok THEN 4 ELSE 0 END
        + CASE WHEN punct_ratio < 0.1 THEN 2 ELSE 0 END
        + CASE WHEN digit_ratio < 0.2 THEN 2 ELSE 0 END
        + CASE WHEN stopword_ratio > 0.01 THEN 2 ELSE 0 END) >= 6 AS keep
FROM m
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint (§2B fingerprinting): md5 of
    the sorted distinct word set — a canonical-form hash that survives word
    reordering, the cheap cousin of MinHash for near-identical detection."""
    docs = load_table(spark, "documents", sf_dir)
    canon = F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    return docs.select(
        "doc_id",
        F.md5(canon).alias("wordset_fp"),
        F.size(F.array_distinct(F.split("text", " "))).alias("vocab_size"),
    )


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       MD5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS wordset_fp,
       CAST(LENGTH(list_distinct(string_split(text, ' '))) AS INT) AS vocab_size
FROM documents
"""


def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-cleanup pass every pretraining pipeline runs:
    exact dedup (canonical doc per content hash) ∘ quality gate — one DAG,
    emitting the surviving corpus with copy counts and scores.

    Shape at 100 TB: the dedup shuffle moves 16-byte digests, the quality
    scan is embarrassingly parallel, and the join keys on doc_id — no stage
    ever ships document text across the cluster twice."""
    docs = load_table(spark, "documents", sf_dir)
    canon = (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("h")
    )
    kept = quality_score(spark, sf_dir).filter(F.col("keep"))
    return canon.join(kept.select("doc_id", "quality"), "doc_id")


CORPUS_CLEAN_PIPELINE_SQL = f"""
WITH canon AS (
  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
  FROM documents GROUP BY MD5(text)
),
q AS ({QUALITY_SCORE_SQL})
SELECT canon.doc_id, canon.n_copies, q.quality
FROM canon JOIN q ON canon.doc_id = q.doc_id
WHERE q.keep
"""


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-token pairs across the corpus — the counting step of
    one BPE/WordPiece merge iteration (tokenizer training's inner loop).

    Shape at 100 TB: the pair explode is map-side (positions, not arrays of
    strings), partial aggregation combines before the single shuffle on the
    pair key, and the top-k is a heap (TakeOrderedAndProject), never a
    global sort. Ties break lexicographically so the result is total-order
    deterministic cross-engine."""
    docs = load_table(spark, "documents", sf_dir)
    # position explode + element_at stays in whole-stage codegen end to
    # end; a transform(...) HOF building per-doc struct arrays would run
    # interpreted per element (the measured 50x loss the MinHash pipeline
    # documents) — same discipline as shingles()
    toks = docs.select(F.split("text", " ").alias("w"))
    pairs = (
        # the >=2 guard matters: Spark's sequence(1, 0) REVERSES to [1, 0]
        # for a single-token doc, yielding a bogus element_at(w, 0) index —
        # it does not produce an empty array like SQL range(1, 1)
        toks.filter(F.size("w") >= 2)
        .select(
            "w", F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i")
        )
        .select(
            F.element_at("w", F.col("i")).alias("a"),
            F.element_at("w", F.col("i") + 1).alias("b"),
        )
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "a", "b")
        .limit(50)
    )


BPE_PAIR_COUNTS_SQL = """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
),
pairs AS (
  SELECT w[CAST(i AS INT)] AS a, w[CAST(i AS INT) + 1] AS b
  FROM toks, UNNEST(range(1, LEN(w))) AS t(i)
)
SELECT a, b, COUNT(*) AS n
FROM pairs
GROUP BY a, b
ORDER BY n DESC, a, b
LIMIT 50
"""


def doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency per token (the exact-integer core of IDF: df and
    corpus size N; the float log happens downstream so engines can't
    disagree). One distinct-(doc,token) shuffle, then a count by token —
    the canonical inverted-index statistics job."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    # corpus size stays IN-plan (broadcast scalar) — an eager .count()
    # here would run a full extra scan at plan-build time
    totals = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(totals))
    )


DOC_FREQUENCY_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
  FROM documents
)
SELECT token, COUNT(*) AS df,
       (SELECT COUNT(*) FROM documents) AS n_docs
FROM tok
GROUP BY token
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (corpus cleaning): redact emails, URLs, and
    long digit runs with typed placeholders, counting each redaction.
    Regexes stay in the RE2-compatible subset (no lookaround) so the same
    pattern text runs identically in Spark (Java regex) and the oracle.

    The synthetic corpus contains no PII, so each doc is suffixed with a
    deterministic email + URL + phone derived from doc_id — the scrubber
    then has real work whose outcome the oracle predicts exactly. One
    scan, pure column expressions."""
    docs = load_table(spark, "documents", sf_dir)
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    url_re = r"https?://[^\s]+"
    phone_re = r"[0-9][0-9-]{7,}[0-9]"
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com"),
        F.lit(" https://ex.com/d/"), F.col("doc_id"),
        F.lit(" tel 090-1234-"), F.lpad(F.col("doc_id") % 10000, 4, "0"),
    )
    no_url = F.regexp_replace(raw, url_re, "<URL>")
    no_email = F.regexp_replace(no_url, email_re, "<EMAIL>")
    clean = F.regexp_replace(no_email, phone_re, "<PHONE>")
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.regexp_extract_all(raw, F.lit(email_re), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(raw, F.lit(url_re), F.lit(0))).alias("n_urls"),
    )


PII_SCRUB_SQL = r"""
WITH raw AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com'
              || ' https://ex.com/d/' || doc_id
              || ' tel 090-1234-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           AS t
  FROM documents
)
SELECT doc_id,
       REGEXP_REPLACE(
         REGEXP_REPLACE(
           REGEXP_REPLACE(t, 'https?://[^\s]+', '<URL>', 'g'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '[0-9][0-9-]{7,}[0-9]', '<PHONE>', 'g') AS clean_text,
       CAST(LENGTH(REGEXP_EXTRACT_ALL(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
         AS n_emails,
       CAST(LENGTH(REGEXP_EXTRACT_ALL(t, 'https?://[^\s]+')) AS INT) AS n_urls
FROM raw
"""


def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition quality gate (LLM corpus filtering):
    per-document distinct-token ratio, most-frequent-token coverage, and
    most-frequent-bigram coverage, plus the keep/reject verdict those
    rules imply. Repetitive boilerplate (low distinct ratio, one dominant
    n-gram) is the classic pretraining-noise signature.

    Scale shape: ONE token explode feeding a two-level partial aggregation
    — (doc, token) counts, then per-doc max/count/sum — and the same for
    bigrams. Bigrams index the split array by exploded POSITION
    (``element_at``, codegen) rather than a ``zip_with`` lambda, which
    would run interpreted (same discipline as the shingle path in
    llm/dedup.py). All ratios are integer/integer IEEE divisions, so the
    oracle agrees bit-for-bit.
    """
    docs = load_table(spark, "documents", sf_dir)
    uni = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("max_tok_n"),
            F.sum("c").alias("n_tokens"),
        )
    )
    arr = docs.select("doc_id", F.split("text", " ").alias("a"))
    big = (
        arr.filter(F.size("a") >= 2)
        .select(
            "doc_id",
            "a",
            F.explode(F.sequence(F.lit(1), F.size("a") - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("a", F.col("i")),
                F.element_at("a", F.col("i") + 1),
            ).alias("bg"),
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bigram_n"), F.sum("c").alias("n_bigrams"))
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens")
    top_token_frac = F.col("max_tok_n").cast("double") / F.col("n_tokens")
    top_bigram_frac = F.coalesce(F.col("max_bigram_n"), F.lit(0)).cast(
        "double"
    ) / F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1))
    return (
        uni.join(big, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            distinct_ratio.alias("distinct_ratio"),
            top_token_frac.alias("top_token_frac"),
            top_bigram_frac.alias("top_bigram_frac"),
            (
                (distinct_ratio >= 0.4)
                & (top_token_frac <= 0.12)
                & (top_bigram_frac <= 0.08)
            ).alias("keep"),
        )
    )


REPETITION_METRICS_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
uc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
uni AS (
  SELECT doc_id, COUNT(*) AS n_distinct, MAX(c) AS max_tok_n,
         SUM(c) AS n_tokens
  FROM uc GROUP BY 1
),
bg AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(a)),
                               i -> a[i] || ' ' || a[i + 1])) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS a FROM documents)
),
bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
bgs AS (
  SELECT doc_id, MAX(c) AS max_bigram_n, SUM(c) AS n_bigrams
  FROM bc GROUP BY 1
)
SELECT u.doc_id,
       CAST(u.n_tokens AS BIGINT) AS n_tokens,
       CAST(u.n_distinct AS BIGINT) AS n_distinct,
       CAST(u.n_distinct AS DOUBLE) / u.n_tokens AS distinct_ratio,
       CAST(u.max_tok_n AS DOUBLE) / u.n_tokens AS top_token_frac,
       CAST(COALESCE(b.max_bigram_n, 0) AS DOUBLE)
         / GREATEST(COALESCE(b.n_bigrams, 0), 1) AS top_bigram_frac,
       (CAST(u.n_distinct AS DOUBLE) / u.n_tokens >= 0.4
        AND CAST(u.max_tok_n AS DOUBLE) / u.n_tokens <= 0.12
        AND CAST(COALESCE(b.max_bigram_n, 0) AS DOUBLE)
              / GREATEST(COALESCE(b.n_bigrams, 0), 1) <= 0.08) AS keep
FROM uni u LEFT JOIN bgs b USING (doc_id)
"""


def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture report (training-data curation): per (lang, source)
    cell — document count, token count, char count, and each cell's share
    of the corpus. This is the table a data-mixing step reweights from.

    Scale shape: token counts come from ``size(split(...))`` — no explode,
    no shuffle of token rows; one partial+final agg over the cells, then
    the corpus totals re-aggregate the TINY cell frame and broadcast back.
    Shares are integer/integer IEEE divisions.
    """
    docs = load_table(spark, "documents", sf_dir)
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    totals = cells.agg(
        F.sum("n_docs").alias("t_docs"), F.sum("n_tokens").alias("t_tokens")
    )
    return (
        cells.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "source",
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.col("n_docs").cast("double") / F.col("t_docs")).alias(
                "doc_share"
            ),
            (F.col("n_tokens").cast("double") / F.col("t_tokens")).alias(
                "token_share"
            ),
        )
    )


CORPUS_MIXTURE_SQL = """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         SUM(len(string_split(text, ' '))) AS n_tokens,
         SUM(length(text)) AS n_chars
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT SUM(n_docs) AS t_docs, SUM(n_tokens) AS t_tokens FROM cells)
SELECT lang, source, n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_docs AS DOUBLE) / t_docs AS doc_share,
       CAST(n_tokens AS DOUBLE) / t_tokens AS token_share
FROM cells, tot
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF (linear-IDF
    variant: score = tf · N / df — products and divisions of doubles are
    correctly-rounded IEEE ops, so the score is bit-identical cross-engine,
    where a transcendental log(N/df) would not be).

    Scale shape: one explode → per-(doc, token) counts (shuffle 1, map-side
    partial agg); the df frame aggregates BEFORE its join so only
    (token, df) rows shuffle (shuffle 2); the per-doc top-3 is a bounded
    row_number window (shuffle 3 on doc_id). Ties break on token asc for a
    total order. No per-doc arrays, no HOFs, no quadratics."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    # tf feeds BOTH the df rollup and the scored join; Spark rebuilds
    # shared subtrees per consumer, so without the checkpoint the
    # explode→count chain (the expensive part) runs twice over the corpus
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = (
        tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", "score", "rnk")
    )


TFIDF_TOP_TERMS_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
),
df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
           / CAST(df.df AS DOUBLE) AS score
  FROM tf JOIN df USING (token)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
  FROM scored
)
SELECT doc_id, token, tf, df, score, rnk FROM ranked WHERE rnk <= 3
"""


def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of document token counts per source — the
    length-distribution report a packing/curriculum step consumes.

    The bucket floor comes from the BINARY-DIGIT LENGTH of the word count
    (length(bin(n)) − 1 = floor(log2 n) in exact integer arithmetic — no
    float log whose last ulp could differ cross-engine); 2^exp stays exact
    in a double far beyond any document length. Single scan, no explode:
    the token count is size(split(...)), and the histogram is one
    partial+final agg over (source, bucket)."""
    docs = load_table(spark, "documents", sf_dir)
    n_words = F.size(F.split("text", " "))
    exp = F.length(F.bin(n_words.cast("long"))) - 1
    bucket_lo = F.pow(F.lit(2), exp).cast("long")
    return (
        docs.select("source", n_words.alias("n"), bucket_lo.alias("bucket_lo"))
        .groupBy("source", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n").cast("long")).alias("n_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
        .orderBy("source", "bucket_lo")
    )


TOKEN_LENGTH_HISTOGRAM_SQL = """
WITH d AS (
  SELECT source,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n,
         CAST(POWER(2, LENGTH(BIN(LEN(STRING_SPLIT(text, ' ')))) - 1)
              AS BIGINT) AS bucket_lo
  FROM documents
)
SELECT source, bucket_lo, COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       MIN(n) AS min_tokens, MAX(n) AS max_tokens
FROM d GROUP BY 1, 2 ORDER BY 1, 2
"""


def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary share per source against a corpus-derived top-K
    vocabulary — the coverage check run before committing to a tokenizer
    vocab. Two phases over one logical input: (1) global token counts →
    deterministic top-K cut (count desc, token asc); (2) re-scan scoring
    every token against the vocab.

    K=16 here: the synthetic corpus has a 31-token domain at every test
    SF, so a cut BELOW the domain size is what makes the OOV branch (the
    left-join miss) and the boundary tie-break actually fire — a K ≥ the
    domain would make the filter vacuous and the oracle trivially green
    (production corpora use 32k–256k; the plan shape is identical).

    The OOV share divides two EXACT integer sums once per source (never an
    average of per-doc floats, whose decimal rounding could differ
    cross-engine). Scale: the vocab is ≤K rows — broadcast — so phase 2
    adds zero shuffles beyond its own rollup; the token explode feeds
    map-side partial aggregation."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(16)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .withColumn(
            "oov_share",
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        )
        .orderBy("source")
    )


VOCAB_OOV_RATE_SQL = """
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
),
vocab AS (
  SELECT token FROM tok GROUP BY token
  ORDER BY COUNT(*) DESC, token LIMIT 16
),
flagged AS (
  SELECT tok.source, (vocab.token IS NOT NULL) AS in_vocab
  FROM tok LEFT JOIN vocab ON tok.token = vocab.token
)
SELECT source, COUNT(*) AS n_tokens,
       COUNT(CASE WHEN NOT in_vocab THEN 1 END) AS n_oov,
       CAST(COUNT(CASE WHEN NOT in_vocab THEN 1 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS oov_share
FROM flagged GROUP BY source ORDER BY source
"""


def token_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitters rollup (Spark 4.1 ``approx_top_k_*``, the
    Datasketches frequent-items family): per-language token sketches
    accumulated in one pass, COMBINEd into a single corpus sketch, top-25
    tokens estimated out with a deterministic (count DESC, token) rank.

    Exactness contract (what lets a sketch op carry an exact oracle,
    same pattern as the HLL partition-independence test): the sketch
    purges only when it tracks more than ``maxItemsTracked`` items, so
    with capacity 1024 ≥ |vocab| every count is exact and the oracle is
    a plain GROUP BY count — pinned by the capacity guard in
    tests/test_vacuity_guards.py. At real corpus scale the capacity is
    sized against the accepted ε·N count error instead; what survives
    the scale-up is the MERGE property (accumulate per shard → combine),
    which is exactly what plain top-k-by-groupBy lacks: sketches add,
    estimates don't.

    Scale shape: accumulate is a partial aggregate (one sketch per
    language per partition shuffles, never token rows); combine touches
    #languages sketch blobs; the final rank orders ≤ capacity rows on
    one partition — all data-proportional work is map-side."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
    per_lang = tok.groupBy("lang").agg(
        F.expr("approx_top_k_accumulate(token, 1024)").alias("sk")
    )
    combined = per_lang.agg(F.expr("approx_top_k_combine(sk)").alias("sk"))
    flat = combined.select(
        F.explode(F.expr("approx_top_k_estimate(sk, 512)")).alias("e")
    ).select(
        F.col("e.item").alias("token"),
        F.col("e.count").alias("cnt"),
    )
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return flat.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= 25)


TOKEN_TOPK_SKETCH_SQL = """
SELECT token, cnt, rank FROM (
  SELECT token, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rank
  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
  GROUP BY token
) WHERE rank <= 25
"""


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, the real iterative loop (3 merge rounds) —
    ``bpe_pair_counts`` is one iteration's statistics; this runs the
    algorithm: per round, count adjacent symbol pairs weighted by word
    frequency, take the argmax pair (count DESC, then lexicographic — a
    total order, so every round is deterministic), apply the merge to
    every word, repeat. Output: the learned merge table, one row per
    round — exactly what a tokenizer trainer persists.

    Representation trick that keeps BOTH engines exact without lookaround
    regex (DuckDB's RE2 has none): symbols are wrapped as ``(sym)`` and a
    merge is the LITERAL replace of ``(a)(b)`` with ``(ab)``. Parens
    can't occur inside symbol text, so a match always aligns to symbol
    boundaries, and left-to-right non-overlapping literal replace is
    precisely BPE's greedy leftmost merge ("a a a" → "aa a").

    Scale shape: the corpus is touched ONCE (the distinct-token count —
    one shuffle of tokens); every round then works on the VOCABULARY
    frequency table (|V| rows, the classic word-count BPE trainer), with
    the argmax pair broadcast into the merge step. Rounds are a driver
    loop over small DataFrames — same pattern as ``ops/graph.pagerank``.
    Oracle: 3 unrolled CTE rounds, bit-exact integer counts."""
    merges, _ = _bpe_train(spark, sf_dir, need_final_seqs=False)
    return local_df(
        spark, merges, "round INT, left_sym STRING, right_sym STRING, pair_count BIGINT"
    )


def _bpe_train(spark: SparkSession, sf_dir: str, need_final_seqs: bool):
    """The trainer loop, shared with the encoder
    (`llm/tokenize.bpe_encode_corpus`). Returns ``(merges, seqs)``:
    ``seqs`` is the (token, cnt, seq) vocabulary AFTER the returned
    merges were applied — exactly the encoded vocabulary the encoder
    needs, so it never re-explodes the corpus or re-applies the merges
    (r14, guide §1.2: the encoder used to recompute the distinct
    vocabulary and replay every merge on it). With
    ``need_final_seqs=False`` the LAST round's merge application and
    checkpoint are skipped — the trainer's own output (the merge
    table) never reads them (one materialization job saved per call)
    — and the returned ``seqs`` is None."""
    docs = load_table(spark, "documents", sf_dir)
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    seqs = vocab.select(
        "token", "cnt", F.regexp_replace("token", "(.)", "($1)").alias("seq")
    ).localCheckpoint(eager=True)  # corpus scan happens once, not per round
    merges = []
    rounds = (1, 2, 3)
    for rnd in rounds:
        symbols = F.split(F.expr("trim(BOTH '()' FROM seq)"), r"\)\(")
        pairs = (
            seqs.select("cnt", symbols.alias("l"))
            .filter(F.size("l") >= 2)
            .select(
                "cnt",
                F.explode(F.sequence(F.lit(0), F.size("l") - 2)).alias("i"),
                "l",
            )
            .select(
                "cnt",
                F.element_at("l", F.col("i") + 1).alias("a"),
                F.element_at("l", F.col("i") + 2).alias("b"),
            )
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("pc"))
        )
        # the argmax is ONE row of bounded metadata — collect it (the same
        # judgment as txn.history's driver-side build) so the merge step
        # uses literals; a broadcast-crossJoin of the uncollected best
        # would re-run the whole pair aggregation when the merge table is
        # later collected, doubling every round's jobs
        best = (
            pairs.orderBy(F.col("pc").desc(), "a", "b").limit(1).first()
        )
        if best is None:
            break  # nothing left to merge (fully merged / 1-char tokens)
        merges.append((rnd, best.a, best.b, int(best.pc)))
        if rnd == rounds[-1] and not need_final_seqs:
            return merges, None  # nothing reads the merged seqs
        seqs = seqs.select(
            "token",
            "cnt",
            F.replace(
                F.col("seq"),
                F.lit(f"({best.a})({best.b})"),
                F.lit(f"({best.a}{best.b})"),
            ).alias("seq"),
        ).localCheckpoint(eager=True)  # stop round-k plan nesting round k-1
    return merges, (seqs if need_final_seqs else None)


def _bpe_round_sql(k: int) -> str:
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
         replace(seq, '(' || best{k}.a || ')(' || best{k}.b || ')',
                 '(' || best{k}.a || best{k}.b || ')') AS seq
  FROM seqs{k - 1}, best{k}
)"""


BPE_TRAIN_MERGES_SQL = f"""
WITH vocab AS (
  SELECT token, COUNT(*) AS cnt FROM (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
  ) GROUP BY token
),
seqs0 AS (
  SELECT token, cnt, regexp_replace(token, '(.)', '(\\1)', 'g') AS seq
  FROM vocab
),{",".join(_bpe_round_sql(k) for k in (1, 2, 3))}
SELECT 1 AS round, a AS left_sym, b AS right_sym, pc AS pair_count FROM best1
UNION ALL
SELECT 2, a, b, pc FROM best2
UNION ALL
SELECT 3, a, b, pc FROM best3
"""


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (the embedding/RAG prep step:
    fixed 200-char chunks, stride 150 → 50-char overlap so no boundary
    sentence is lost). Emits one row per chunk with its offset, actual
    length (the tail chunk is shorter), and content hash — the manifest a
    chunk-level embedding job consumes. A chunk only exists if it brings
    content beyond the previous chunk's window (otherwise the tail would
    re-embed a wholly contained duplicate slice); an empty document
    yields one empty chunk rather than a crash or an engine divergence.

    Scale shape: a bounded-range explode (offsets precomputed from
    length, never a while-loop UDF) over a single scan; each chunk row
    carries only its 200-char slice + hash, so the shuffle-free
    projection parallelizes embarrassingly. Chunk count per doc =
    ceil(max(len−50, 1)/150), exact in integer arithmetic and identical
    in both engines by construction of the range bound."""
    docs = load_table(spark, "documents", sf_dir)
    # last offset: the biggest 1+150k still bringing NEW content — i.e.
    # 1+150k ≤ len−50, floored at 1 so every doc (even empty) yields one
    # chunk; a plain "while offset ≤ len" rule would emit a tail chunk
    # wholly contained in its predecessor whenever the tail ≤ overlap
    chunked = docs.select(
        "doc_id",
        F.posexplode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length("text") - 50, F.lit(1)),
                F.lit(150),
            )
        ).alias("chunk_id", "offset"),
        F.col("text"),
    )
    chunk = F.substring(F.col("text"), F.col("offset").cast("int"), 200)
    return chunked.select(
        "doc_id",
        "chunk_id",
        "offset",
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


DOC_CHUNKING_SQL = """
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       1 + i * 150 AS offset,
       LENGTH(substring(text, CAST(1 + i * 150 AS INT), 200)) AS chunk_len,
       MD5(substring(text, CAST(1 + i * 150 AS INT), 200)) AS chunk_md5
FROM documents,
     UNNEST(range(0, (GREATEST(LENGTH(text) - 50, 1) + 149) // 150)) AS t(i)
"""


QUERIES = {
    "text_stats": text_stats,
    "language_id": language_id,
    "quality_score": quality_score,
    "doc_fingerprint": doc_fingerprint,
    "corpus_clean_pipeline": corpus_clean_pipeline,
    "bpe_pair_counts": bpe_pair_counts,
    "doc_frequency": doc_frequency,
    "pii_scrub": pii_scrub,
    "repetition_metrics": repetition_metrics,
    "corpus_mixture": corpus_mixture,
    "tfidf_top_terms": tfidf_top_terms,
    "token_length_histogram": token_length_histogram,
    "vocab_oov_rate": vocab_oov_rate,
    "token_topk_sketch": token_topk_sketch,
    "bpe_train_merges": bpe_train_merges,
    "doc_chunking": doc_chunking,
}

ORACLES = {
    "text_stats": TEXT_STATS_SQL,
    "language_id": LANGUAGE_ID_SQL,
    "quality_score": QUALITY_SCORE_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "corpus_clean_pipeline": CORPUS_CLEAN_PIPELINE_SQL,
    "bpe_pair_counts": BPE_PAIR_COUNTS_SQL,
    "doc_frequency": DOC_FREQUENCY_SQL,
    "pii_scrub": PII_SCRUB_SQL,
    "repetition_metrics": REPETITION_METRICS_SQL,
    "corpus_mixture": CORPUS_MIXTURE_SQL,
    "tfidf_top_terms": TFIDF_TOP_TERMS_SQL,
    "token_length_histogram": TOKEN_LENGTH_HISTOGRAM_SQL,
    "vocab_oov_rate": VOCAB_OOV_RATE_SQL,
    "token_topk_sketch": TOKEN_TOPK_SKETCH_SQL,
    "bpe_train_merges": BPE_TRAIN_MERGES_SQL,
    "doc_chunking": DOC_CHUNKING_SQL,
}
