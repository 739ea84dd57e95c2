"""Corpus mixture shaping for training-data assembly (SURVEY §2B LLM
ext): temperature-flattened source sampling and token-budget
subsetting — the two knobs between a curated corpus and a training
mixture (cf. XLM-R §3.1 temperature sampling; every LLM data recipe's
per-source token budgets).

Determinism discipline (same as `llm/training.py` / `llm/sampling.py`):
every sampling decision is multiplicative hashing on exact integers —
no RNG — so mixtures are reproducible run-to-run, engine-to-engine,
and under any partitioning. Cross-engine exactness is engineered, not
hoped for: the only non-integer step is ``floor(sqrt(integer))``, and
IEEE-754 requires sqrt to be correctly rounded (Java ``Math.sqrt`` and
DuckDB ``std::sqrt`` agree bit-for-bit), so quotas are identical
integers in both engines. No ``pow``/``ln`` (not correctly rounded —
the same reason `llm/lm_score.py` keeps its scores pytest-oracled).

Scale posture: per-source quotas come from ONE dimension-sized
aggregate; selection is a per-source window over the hash priority
(``partitionBy(source)`` — never a global ORDER BY, which would be a
single-partition sort at corpus scale). Two shuffles total (agg +
window), both on the source key; document text never rides either.

New module per the evidence-ledger rule; registered at the registry
TAIL HEAD as round-9's window head (driver rows land next round; both
queries are differential-verified bare-session in-repo this round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io.sources import load_table
from .export import whitespace_token_count
from .porthash import WS_CLASS as _WS
from .training import _KNUTH  # one source of truth for the constant

_M = 1_000_000_007  # priority modulus (prime, ~2^30: ample resolution)


def _priority(col):
    """Deterministic per-doc priority in [0, _M) — the 'random' key
    every selection below ranks by. The id is reduced mod _M BEFORE
    the multiply: xxhash64-derived doc_ids are full-range int64, and a
    raw id·KNUTH product would overflow — Spark wraps two's-complement
    but DuckDB RAISES, and an arbitrary-precision Python reference
    would rank differently (review-caught). pmod(id) < 2^30 keeps the
    product under 2^62 in every engine."""
    return F.pmod(F.pmod(col, F.lit(_M)) * F.lit(_KNUTH), F.lit(_M))


def temperature_sample_df(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """α=0.5 temperature-flattened mixture by deterministic downsampling.

    Target mixture ∝ sqrt(n_s) (α=0.5 flattening). A downsampling-only
    sampler realizes it by anchoring at the SMALLEST source (rate_s =
    sqrt(n_min/n_s), so the smallest source keeps everything and every
    larger source shrinks toward the flattened share): quota_s =
    n_s·rate_s = ``floor(sqrt(n_s · n_min))`` — the geometric mean of
    each source's size and the smallest's. Documents are never
    replicated (an up-sampler belongs in the training loader, not the
    corpus). The quota is filled by the ``quota_s`` smallest hash
    priorities, so adding or removing OTHER sources never changes
    which documents a source keeps (only how many).
    """
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("_n_s")
    )
    n_min = counts.agg(F.min("_n_s").alias("_n_min"))
    quotas = counts.crossJoin(F.broadcast(n_min)).select(
        F.col(source_col).alias("_q_src"),
        F.least(
            F.col("_n_s"),
            F.floor(F.sqrt(F.col("_n_s") * F.col("_n_min"))),
        ).alias("_quota"),
    )
    w = Window.partitionBy(source_col).orderBy(
        _priority(F.col(id_col)), F.col(id_col)
    )
    # null-safe join: a NULL source is a REAL group (it participates in
    # the anchor via groupBy, so it must receive its quota too — a
    # plain equi-join would silently drop NULL-source documents while
    # still letting them shrink every other source's quota)
    return (
        docs.join(
            F.broadcast(quotas),
            F.col(source_col).eqNullSafe(F.col("_q_src")),
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_quota"))
        .select(*docs.columns)
    )


def token_budget_subset_df(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic subset holding approximately ``budget_tokens``
    whitespace tokens, the budget split into equal integer per-source
    shares (remainder undistributed — a fixed contract, not a
    floating allocation). Within each source, documents fill the share
    in hash-priority order; a document enters iff it STARTS inside the
    share (prefix-sum cut — the standard budget semantics). Each
    source may therefore overrun its share by at most one document's
    tail, so the total can exceed ``budget_tokens`` by up to
    ``n_sources · (max doc tokens − 1)``; callers needing a hard
    ceiling should truncate the final overrunning document downstream
    (the trainer's packing step already cuts at ``seq_len``
    boundaries, which is why the corpus-side contract is the cut rule,
    not a ceiling).

    Appends ``n_tokens`` and the within-share ``tok_start`` offset —
    the numbers a mixture audit wants next to each kept document.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    # the share is computed IN-PLAN (broadcast scalar) — an eager
    # distinct().count() here would cost a full corpus scan before the
    # operator's own job starts (review-caught); the group count is
    # count_distinct + a NULL-group indicator so the NULL source is a
    # real group here exactly as it is in the window below
    n_groups = docs.agg(
        (
            F.count_distinct(source_col)
            + F.max(F.isnull(source_col).cast("int"))
        ).alias("_n_groups")
    )
    share = F.when(
        F.col("_n_groups") > 0,
        F.lit(int(budget_tokens)).cast("bigint") / F.col("_n_groups"),
    ).otherwise(F.lit(0))
    w = (
        Window.partitionBy(source_col)
        .orderBy(_priority(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = (
        docs.crossJoin(F.broadcast(n_groups))
        .withColumn("n_tokens", whitespace_token_count(F.col(text_col)))
        .withColumn("tok_end", F.sum("n_tokens").over(w))
        .withColumn("_share", F.floor(share))
    )
    return (
        with_cum.filter(F.col("tok_end") - F.col("n_tokens") < F.col("_share"))
        .select(
            *docs.columns,
            "n_tokens",
            (F.col("tok_end") - F.col("n_tokens")).alias("tok_start"),
        )
    )


# ---------------------------------------------------------------------------
# registry queries + DuckDB oracles
# ---------------------------------------------------------------------------

_BUDGET = 10_000


def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept doc ids + per-language kept counts under α=0.5 flattening
    over the LANGUAGE dimension (the imbalanced one in this corpus —
    the uniform `source` column would make flattening a no-op and the
    row vacuous; tests/test_mixture.py pins that the quota binds)."""
    docs = load_table(spark, "documents", sf_dir)
    kept = temperature_sample_df(docs, source_col="lang")
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("lang")
    )


TEMPERATURE_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang
), quotas AS (
  SELECT lang,
         LEAST(n_s, CAST(FLOOR(SQRT(CAST(n_s AS DOUBLE)
                                    * (SELECT MIN(n_s) FROM counts)))
                    AS BIGINT)) AS quota
  FROM counts
), ranked AS (
  SELECT d.lang,
         ROW_NUMBER() OVER (
           PARTITION BY d.lang
           ORDER BY ((((d.doc_id % {_M} + {_M}) % {_M}) * {_KNUTH}) % {_M} + {_M}) % {_M}, d.doc_id
         ) AS rk
  FROM documents d
)
SELECT r.lang, COUNT(*) AS n_kept
-- IS NOT DISTINCT FROM mirrors the implementation's eqNullSafe join:
-- a NULL lang is a real group and must meet its quota, not be dropped
-- by equi-join NULL semantics (r8 ADVICE)
FROM ranked r JOIN quotas q ON r.lang IS NOT DISTINCT FROM q.lang
WHERE r.rk <= q.quota
GROUP BY r.lang
ORDER BY r.lang
"""


def token_budget_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "text"
    )
    return token_budget_subset_df(docs, _BUDGET).select(
        "doc_id", "source", "n_tokens", "tok_start"
    )


def _token_budget_sql() -> str:
    # the per-source share is an integer contract: budget // n_sources
    return f"""
WITH shares AS (
  -- // : DuckDB's / on integers is double division and CAST rounds;
  -- the contract is floor division. The NULL source (if any) is a
  -- real group, so it counts: COUNT(DISTINCT) alone excludes NULL
  SELECT {_BUDGET} // (COUNT(DISTINCT source)
                       + MAX(CASE WHEN source IS NULL THEN 1 ELSE 0 END))
         AS share
  FROM documents
), toks AS (
  SELECT doc_id, source,
         -- explicit class, not \\s+: RE2's \\s excludes \\x0B while the
         -- Spark side's Java \\s includes it (ONE definition: porthash.WS_CLASS)
         CAST(len(list_filter(regexp_split_to_array(text,
                                '{_WS}'),
                              w -> w != '')) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT *, SUM(n_tokens) OVER (
    PARTITION BY source
    ORDER BY ((((doc_id % {_M} + {_M}) % {_M}) * {_KNUTH}) % {_M} + {_M}) % {_M}, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS tok_end
  FROM toks
)
SELECT doc_id, source, n_tokens,
       CAST(tok_end - n_tokens AS BIGINT) AS tok_start
FROM cum, shares
WHERE tok_end - n_tokens < share
"""


QUERIES = {
    "temperature_mixture_sample": temperature_mixture_sample,
    "token_budget_subset": token_budget_subset,
}

ORACLES = {
    "temperature_mixture_sample": TEMPERATURE_MIXTURE_SQL,
    "token_budget_subset": _token_budget_sql(),
}
