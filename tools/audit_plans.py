"""Plan-level recompute audit across every registered query.

Usage: python tools/audit_plans.py [sf_dir]

DataFrame reuse is lineage reuse, not computation reuse: a frame consumed
by two downstream operators re-plans its whole subtree per consumer unless
it is materialized (localCheckpoint) or Spark happens to emit a
ReusedExchange. That defect class has now appeared twice (the LSH shingle
frame in round 2, the unigram LM frame in round 3), so this tool makes it
visible for the WHOLE registry: for each query it counts parquet-scan
nodes per table in the final physical plan and prints any query that scans
one table more than once. Multiple scans are not automatically wrong
(self-joins, union fixtures, planted-copy constructions scan twice by
design), so the output is a review list, not a gate — but every entry
should have a known reason.
"""

from __future__ import annotations

import io
import os
import re
import sys

from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Reviewed multi-scan reasons. Every entry here was inspected: the extra
# scans are the query's SEMANTICS (self-joins, two dimension roles, scalar
# subquery + main pass, planted-copy union fixtures that union the same
# parquet twice), or the documented two-scan formulation of an operator
# whose single-scan variant exists (exact_dedup single_pass). A query that
# starts multi-scanning WITHOUT an entry lands in the UNEXPLAINED section —
# that's the lineage-replay regression signal this tool exists to catch
# (it found the LSH 6x tokenize in round 2 and the unigram 3x in round 3).
EXPLAINED = {
    "q02_min_cost_supplier": "partsupp derived from lineitem+part, part re-read for the size/type filter",
    "q09_product_profit": "partsupp derivation reads lineitem+part; the profit join reads both again",
    "q16_supplier_cnt": "partsupp derivation + part brand/size filter",
    "q20_excess_stock_suppliers": "partsupp derivation + year-shipped aggregate both read lineitem",
    "q_media_phash_dedup": "planted-copy union fixture x dedup anti-join branches",
    "q07_nation_volume": "nation joined twice (supplier role + customer role)",
    "q08_market_share": "nation joined twice (two roles)",
    "q17_small_quantity": "correlated avg subquery + main pass (TPC-H shape)",
    "q18_large_volume_customer": "HAVING subquery + join-back (TPC-H shape)",
    "q21_waiting_supplier": "l1/l2/l3 lineitem self-joins (EXISTS + NOT EXISTS)",
    "q22_idle_customers": "scalar avg subquery + main customer pass",
    "q_asof_join": "events as both quote and trade stream (self as-of)",
    "q_char_lsh_dedup": "planted-copy union fixture (2 branches)",
    "q_corpus_prep": "multi-signal prep: stats + filters re-derive per branch",
    "q_cosine_topk": "query rows + corpus rows from one table",
    "q_decontaminate": "corpus + benchmark fixture from one table",
    "q_decontaminate_spans": "corpus + benchmark + span check",
    "q_detect_changed": "current vs incoming fixture from one table",
    "q_dq_new_values": "history vs batch fixture",
    "q_dup_cluster_stats": "planted-copy union fixture",
    "q_eeo4_full_report": "row counts + pct denominator pass",
    "q_embedding_neardup": "pair join: both sides from one table",
    "q_exact_dedup": "union fixture x documented two-scan min+semi-join form",
    "q_except_intersect": "EXCEPT/INTERSECT branches are separate scans",
    "q_fingerprint": "planted-copy union fixture",
    "q_gopher_filter": "line/ngram/char repetition signals union fixture",
    "q_groupwise_max": "max-per-group + join-back",
    "q_id_fallback_join": "primary + fallback join attempts (by design)",
    "q_increment_counts": "existing counts + delta fixture",
    "q_incremental_dedup": "batch + master fixture from one table",
    "q_incremental_merge": "events as batch and master fixture",
    "q_insert_new_records": "target + incoming fixture",
    "q_ivf_topk": "query rows + corpus rows (+ planted copies)",
    "q_linked_array_merge": "existing + incoming linked arrays",
    "q_minhash_cc_dedup": "planted-copy union fixture",
    "q_minhash_lsh_dedup": "planted-copy union fixture",
    "q_ngram_jaccard": "pair join: both sides from one table",
    "q_ngram_repetition": "planted repetition union fixture",
    "q_parcel_centroid": "parcels + points from one table",
    "q_parcel_centroid_shoelace": "parcels + points from one table",
    "q_remove_false_parents": "parents + children from one table",
    "q_replace_matched_rows": "target + replacement fixture",
    "q_self_join_pairs": "employee-manager self-join",
    "q_signlsh_topk": "query + corpus + planted copies",
    "q_snapshot_append": "prior snapshot + new batch fixture",
    "q_submitter_linkage": "requests + submitters fixture",
    "q_sync_311_updates": "anti + inner branches over source",
    "q_sync_update": "target + source update pass",
    "q_tfidf_top_terms": "term stats + doc join-back",
    "q_timebank_discrepancy": "three balance sources from one table",
    "q_top_k_types": "top-k list + join-back (by design)",
    "q_unigram_logprob": "LM build + scoring side (documented 2 tokenizes)",
    "q_update_submitter": "aggregate + anti-union branches",
    "q_validate_orders": "row rules + unique + referential checks",
    "q_asof_forward_tolerance": "events as both quote and trade stream (self as-of)",
    "q_asof_nearest": "events as both quote and trade stream (self as-of)",
    "q_curation_mix": "union fixture x span-stats internal consumers; survivor set checkpointed at the stage boundary (was 16 scans unchecked)",
    "q_domain_mixture_sample": "domain-count aggregate + row-filter pass (rates derived from the corpus itself)",
    "q_domain_mixture_upsample": "domain-count aggregate + repeat-epoch expansion pass",
    "q_duplicate_spans": "union fixture x 3 operator consumers (gram agg, semi join, n_tokens join-back) — a 2nd/3rd scan beats materializing a row-per-token frame",
    "q_embedding_lsh_cc_dedup": "pair join: both sides from one table",
    "q_filter_old_values": "current vs incoming fixture from one table",
    "q_full_refresh_merge": "target + incoming + tombstone branches",
    "q_geocode_crosswalk": "address input + crosswalk fixture from one table",
    "q_gopher_full_features": "line / top-ngram / dup-ngram signal families",
    "q_nfc_normalize": "planted-NFD union fixture",
    "q_perplexity_buckets": "LM build + scoring pass + language join-back (documented 2-tokenize, same as q_unigram_logprob)",
    # round-11 review of the round-10 additions (the r10 verdict's seven):
    "q_dsir_weights": "pool featurize x2 (measured materialize=False default: recompute beat the eager-checkpoint round-trip, envelope mins 10.458 vs 13.822 s — bench_out/rebench_dsir_materialize_r11.json) + target featurize + final weight join-back; the r10 x3-target tt/ts re-aggregation defect is fixed (window totals, dsir_log_ratios)",
    "q_dsir_resample": "same 4-scan shape as q_dsir_weights (resample is TakeOrderedAndProject on top, adds no scan)",
    "q_spec_curation": "perplexity_buckets dispatched through run_spec: identical 3-scan shape to q_perplexity_buckets (documented 2-tokenize + language join-back)",
    "q_cluster_safe_split": "planted-copy union fixture (docs + prefix-clipped twins from one table)",
    "q_incremental_dedup_grouped": "batch + novel-docs fixture from one table (same fixture class as q_incremental_dedup; the signature STORE side is checkpointed and scan-free)",
    "q_sq8_topk": "query rows + corpus rows from one table (same shape as q_cosine_topk)",
    "q_unimax_sample": "allocation aggregate + admission join pass (same class as q_domain_mixture_sample: rates derived from the corpus itself)",
    # round-11 classifier family:
    "q_quality_classifier": "feature explode + id join-back so zero-feature docs score sigmoid(bias) (r11 codegen-explode serving form)",
    "q_quality_classifier_train": "scoring sweep only: feature explode + id join-back — the GD iterations run eagerly via model-sized collects and never appear in the final plan",
    # round-12 review of the round-12 additions:
    "q_classifier_auc": "serving featurize (text+id) + the id spine inside hashed_linear_score's join-back + the label projection (id+lang) — three column-pruned parquet scans, each reading only its 1-2 columns; cheaper than materializing a corpus-sized scored frame for a one-row output",
    "q_classifier_pr_auc": "same _serving_path_scored shape as q_classifier_auc (featurize + join-back spine + label projection, all column-pruned); the AP windows run over the model-sized per-distinct-score frame, not the corpus",
    "q_classifier_calibration": "same _serving_path_scored shape as q_classifier_auc (featurize + join-back spine + label projection, all column-pruned); the bin aggregate is one map-side-combined pass to ≤10 rows",
    "q_classifier_eval": "held-out scoring sweep: test-split featurize + label/id spine (the training side's feature and label frames are eagerly checkpointed inside train_hashed_classifier and never appear in the final plan — same class as q_quality_classifier_train)",
    "q_spec_two_frame_merge": "upsert over one table playing both roles: master anti-join spine + incoming key-distinct + incoming union branch — three column-pruned scans of the same parquet; in production master and incoming are different tables and the shape is one scan each",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from data_rivers_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="audit_plans")
    queries = entry.queries()
    flagged: list[tuple[str, dict[str, int]]] = []
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            print(f"ERR   {name}: {e}")
            continue
        tables = Counter(
            m.group(1)
            for m in re.finditer(r"Location:.*?/(\w+)\.parquet\b", plan)
        )
        dupes = {t: n for t, n in tables.items() if n > 1}
        if dupes:
            flagged.append((name, dupes))
    unexplained = []
    for name, dupes in flagged:
        counts = ", ".join(f"{t}x{n}" for t, n in sorted(dupes.items()))
        if name in EXPLAINED:
            print(f"known  {name}: {counts}  [{EXPLAINED[name]}]")
        else:
            unexplained.append((name, counts))
    for name, counts in unexplained:
        print(f"UNEXPLAINED  {name}: {counts}")
    print(
        f"\n{len(flagged)}/{len(queries)} multi-scan queries: "
        f"{len(flagged) - len(unexplained)} reviewed-by-design, "
        f"{len(unexplained)} UNEXPLAINED (treat as regressions)"
    )


if __name__ == "__main__":
    main()
