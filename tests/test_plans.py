"""Physical-plan shape assertions — the scale contract.

The reference hand-builds its efficiency (late-materialized filters
SsaProgram.cpp:615-678, column pruning ParquetBlockInputStream.cpp:24-38,
two-phase aggregation Aggregator.cpp:745-773); here Catalyst supplies it, so
each key query asserts the compiled plan kept the property: pushdown reached
the scan, ReadSchema is pruned, small dims broadcast, top-k never globally
sorts, and nothing funnels through a single-task window or cartesian product.
"""

from __future__ import annotations

import pytest

from arrowhouse_spark import suite
from arrowhouse_spark.plans import PlanCheckError, check_plan, report
from arrowhouse_spark.plans.inspect import plan_text


@pytest.fixture(scope="module")
def qs():
    return suite.queries()


def test_scan_filter_project_pushdown_and_pruning(spark, sf_dir, qs):
    df = qs["ssa_scan_filter_project"](spark, sf_dir)
    r = check_plan(df, require_pushed_filters=True, max_read_columns=8)
    assert r.codegen_stages >= 1


def test_q1_two_phase_aggregation(spark, sf_dir, qs):
    df = qs["q1_pricing_summary"](spark, sf_dir)
    r = check_plan(df, require_pushed_filters=True, max_read_columns=8)
    # partial -> shuffle -> final, exactly one shuffle keyed on the group keys
    assert r.partial_final_agg
    assert r.exchanges == 1


def test_broadcast_join_for_small_dims(spark, sf_dir, qs):
    df = qs["join_broadcast_revenue"](spark, sf_dir)
    check_plan(df, require_broadcast_join=True, forbid_sortmerge_join=True)


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir, qs):
    df = qs["sort_topk"](spark, sf_dir)
    r = report(df)
    assert r.has_take_ordered
    # TakeOrderedAndProject replaces a full Sort+Exchange — no range shuffle
    assert "rangepartitioning" not in plan_text(df)


def test_groupby_limit_has_no_global_window(spark, sf_dir, qs):
    df = qs["groupby_limited_top"](spark, sf_dir)
    check_plan(df)  # forbids unpartitioned windows and cartesian products


def test_groupby_limit_arrival_takeordered_and_broadcast(spark, sf_dir, qs):
    """Arrival-order ANY: the kept-key election must be a TakeOrdered (never
    a global sort) and the ≤max_rows key set must broadcast into semi/anti
    joins — no sort-merge join of the fact table against itself."""
    df = qs["groupby_limited_any_arrival"](spark, sf_dir)
    r = check_plan(df, forbid_sortmerge_join=True)
    assert r.has_take_ordered
    t = plan_text(df).lower()
    assert "rangepartitioning" not in t
    assert "broadcasthashjoin" in t


def test_replace_merge_window_is_partitioned(spark, sf_dir, qs):
    df = qs["replace_merge_latest"](spark, sf_dir)
    check_plan(df)


def test_distinct_keys_is_hash_aggregate(spark, sf_dir, qs):
    df = qs["distinct_keys"](spark, sf_dir)
    r = report(df)
    assert r.partial_final_agg  # DISTINCT compiles to partial+final hash agg


def test_global_window_detector_fires(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = (
        spark.range(10)
        .withColumn("rk", F.row_number().over(Window.orderBy("id")))
    )
    with pytest.raises(PlanCheckError, match="unpartitioned Window"):
        check_plan(df)


def test_pushed_filter_detector_fires(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(PlanCheckError, match="PushedFilters"):
        check_plan(df.select("l_orderkey"), require_pushed_filters=True)


def test_pack_sequences_window_is_partitioned(spark, sf_dir, qs):
    """The packing cumsum must ride a bucket-partitioned window — an
    unpartitioned window here would serialize the whole corpus."""
    df = qs["pack_sequences_docs"](spark, sf_dir)
    r = check_plan(df)
    assert r.exchanges <= 2


def test_line_dedup_no_cartesian_and_hash_keyed(spark, sf_dir, qs):
    """Line df-count + anti-join + reassembly: no cartesian product, and the
    joins/aggregations key on the 8-byte line hash, not the line string."""
    df = qs["line_dedup_docs"](spark, sf_dir)
    check_plan(df)
    assert "xxhash64" in plan_text(df).lower()


def test_dedup_incremental_antijoin_shape(spark, sf_dir, qs):
    df = qs["dedup_incremental_docs"](spark, sf_dir)
    check_plan(df)
    assert "leftanti" in plan_text(df).lower().replace(" ", "")


def test_hash_parity_queries_are_pure_codegen(spark, sf_dir, qs):
    """The staged-projection hash forms must compile to plain long
    arithmetic: NO ArrayTransform anywhere in the plan (a higher-order
    function is CodegenFallback — interpreted per row with an array
    allocation per mix stage, measured ~7× slower), and at least one
    whole-stage codegen span covering the project."""
    from arrowhouse_spark.plans.inspect import codegen_stage_count

    for name in ("city_hash_int_parity", "int_hash_parity"):
        df = qs[name](spark, sf_dir)
        text = plan_text(df)
        assert "transform(" not in text, f"{name}: HOF let-binding in plan"
        assert codegen_stage_count(df) >= 1, f"{name}: no codegen span"


def test_pipeline_pretrain_corpus_plan_shape(spark, sf_dir, qs):
    """The composed five-stage pipeline (flagship demo) must keep the
    single-task-free contract AND a scan-sharing mechanism: no cartesian,
    no unpartitioned window, and the stage families must NOT re-execute
    the upstream chain per reference — either via AQE runtime exchange
    reuse of the shared token subtree, or (the current shape) via the
    surv3 lineage cut, whose checkpoint leaf every downstream consumer
    reads (the final plan then contains the materialized-RDD scan instead
    of ReusedExchange nodes)."""
    from arrowhouse_spark.plans.inspect import runtime_exchange_reuse

    df = qs["pipeline_pretrain_corpus"](spark, sf_dir)
    check_plan(df)  # forbids cartesian + global window
    df.count()
    final = df._jdf.queryExecution().executedPlan().toString()
    shared = (
        runtime_exchange_reuse(df) > 0
        or "ExistingRDD" in final
        or "Scan ExistingRDD" in final
    )
    assert shared, (
        "composed pipeline shows neither runtime exchange reuse nor a "
        "lineage-cut leaf — the shared token subtree is being re-executed "
        "per stage family"
    )


def test_chunk_split_is_shuffle_free_map_side(spark, sf_dir, qs):
    df = qs["doc_chunk_split"](spark, sf_dir)
    r = check_plan(df, max_read_columns=2)
    # pure explode/slice: no exchange, no join, anywhere
    assert r.exchanges == 0
    assert r.broadcast_joins == 0 and r.sortmerge_joins == 0


def test_snapshot_diff_single_keyed_join_no_text_shuffle(spark, sf_dir, qs):
    df = qs["corpus_snapshot_diff"](spark, sf_dir)
    r = check_plan(df, max_read_columns=2)
    # one full-outer SMJ = exactly two keyed exchanges; fingerprints are
    # computed below them so no text column crosses the shuffle
    assert r.sortmerge_joins == 1
    assert r.exchanges == 2
    txt = plan_text(df)
    exchange_args = [
        ln for ln in txt.splitlines() if "Arguments: hashpartitioning" in ln
    ]
    assert exchange_args and all("text" not in ln for ln in exchange_args)


def test_label_centroid_partial_final_agg_and_broadcast(spark, sf_dir, qs):
    df = qs["label_centroid_sim"](spark, sf_dir)
    r = check_plan(df)
    assert r.partial_final_agg
    assert r.broadcast_joins == 1
    assert r.sortmerge_joins == 0


def test_quality_quantile_broadcast_threshold_join(spark, sf_dir, qs):
    df = qs["quality_quantile_filter"](spark, sf_dir)
    r = check_plan(df)
    assert r.broadcast_joins == 1
    assert r.sortmerge_joins == 0


def test_binaryfile_ingest_partial_final_agg(spark, sf_dir, qs):
    """binaryFile rollup: two-phase hash aggregate over the media scan,
    no cartesian, no unpartitioned window — the per-file (type, path, md5)
    rows shuffle, never payloads (the payload md5 is computed map-side)."""
    df = qs["binaryfile_ingest_stats"](spark, sf_dir)
    r = report(df)
    assert r.partial_final_agg
    check_plan(df)


def test_bpe_apply_is_broadcast_map_side(spark, sf_dir, qs):
    """bpe_encode_pretrained's APPLICATION half: the merge table reaches
    every document via a broadcast (BroadcastNestedLoopJoin of the 1-row
    packed array), never a shuffle of the corpus, and nothing degenerates
    to CartesianProduct."""
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.bpe import (
        bpe_apply_merges,
        bpe_train_merges_batched,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train_merges_batched(
        docs.filter(F.col("doc_id") % 2 == 0), n_merges=4, batch_size=4
    ).localCheckpoint(eager=False)  # isolate the ENCODE half's plan
    enc = bpe_apply_merges(docs.filter(F.col("doc_id") % 2 == 1), merges)
    r = report(enc)
    # the 1-row packed merge array arrives as BroadcastNestedLoopJoin
    # (report.broadcast_joins counts only BroadcastHashJoin)
    assert "BroadcastNestedLoopJoin" in r.operators
    assert not r.has_cartesian
    # corpus side: zero shuffle exchanges; the only exchange is the packed
    # merge table's single-partition global agg (bounded, KB-sized)
    assert r.exchanges <= 1


def test_q5_pushdown_no_cartesian(spark, sf_dir, qs):
    # six-table join: the date filter must reach the orders scan, nothing
    # may degrade to a cartesian/BNLJ, and no single-task window appears
    df = qs["q5_local_supplier_volume"](spark, sf_dir)
    r = check_plan(df, require_pushed_filters=True)
    assert r.exchanges <= 2  # only the final aggregate (+ AQE artifacts)


def test_lateral_topk_decorrelates_to_group_limit(spark, sf_dir, qs):
    # Catalyst must rewrite the correlated LATERAL LIMIT into a keyed
    # WindowGroupLimit (map-side top-k) — not a per-nation loop or a
    # cartesian; the window is partitioned by the correlation key
    df = qs["lateral_topk_per_nation"](spark, sf_dir)
    check_plan(df)  # forbids cartesians and unpartitioned windows
    assert "WindowGroupLimit" in plan_text(df)


def test_null_safe_join_stays_hash_keyed(spark, sf_dir, qs):
    # EqualNullSafe must remain a join KEY (hash/SMJ), never a post-join
    # filter over a cartesian
    df = qs["join_null_safe"](spark, sf_dir)
    check_plan(df)
    assert "cartesian" not in plan_text(df).lower()


def test_pipe_syntax_compiles_to_classic_plan(spark, sf_dir, qs):
    # the |> form is syntax only: same pushed filter + partial->final agg
    df = qs["pipe_syntax_rollup"](spark, sf_dir)
    r = check_plan(df, require_pushed_filters=True)
    assert r.partial_final_agg
    assert r.exchanges == 1


def test_hist_quantile_runs_on_state_sized_relations(spark, sf_dir, qs):
    # after the one data-sized keyed agg, everything downstream (cumulative
    # theta-join, quantile selection) must be broadcast-sized — no extra
    # data-sized shuffles and no windows
    df = qs["hist_quantile_state_merge"](spark, sf_dir)
    check_plan(df)


def test_q21_algebraized_exists_pair_shape(spark, sf_dir, qs):
    # the EXISTS/NOT-EXISTS pair is ONE per-(order,supplier) rollup + a
    # per-order count join: keyed exchanges only, top-20 via TakeOrdered
    # (never a global sort), no cartesian anywhere
    df = qs["q21_sole_late_shipper"](spark, sf_dir)
    r = check_plan(df)
    assert report(df).has_take_ordered
    assert r.exchanges <= 5


def test_q2_decorrelated_min_broadcasts(spark, sf_dir, qs):
    # the regional-min subquery decorrelates to a keyed min joined BACK by
    # broadcast; part/supplier/nation/region dims broadcast too
    df = qs["q2_min_cost_supplier"](spark, sf_dir)
    r = check_plan(df, require_broadcast_join=True)
    assert r.exchanges <= 3  # offers rollup + regional min; dims broadcast


def test_q8_share_single_keyed_aggregate(spark, sf_dir, qs):
    # the market-share ratio is ONE keyed aggregate over the join tree —
    # numerator and denominator in the same pass, never two scans
    df = qs["q8_market_share"](spark, sf_dir)
    r = check_plan(df, require_pushed_filters=True)
    assert r.partial_final_agg
    n_scans = plan_text(df).count("lineitem.parquet")
    assert n_scans == 1


def test_q11_global_scalar_is_broadcast(spark, sf_dir, qs):
    # HAVING over the global total: a 1-row broadcast to the per-part
    # relation, never a window over it
    df = qs["q11_important_parts"](spark, sf_dir)
    r = check_plan(df, require_broadcast_join=True)
    assert not report(df).has_global_window


def test_token_runs_windows_are_doc_partitioned(spark, sf_dir, qs):
    # gaps-and-islands: both windows partition by doc_id (the check_plan
    # default forbids the unpartitioned form), one keyed exchange
    df = qs["doc_token_runs"](spark, sf_dir)
    r = check_plan(df)
    assert r.exchanges <= 2


def test_regression_by_segment_broadcast_and_two_phase(spark, sf_dir, qs):
    # regr_* must run as one broadcast join + partial->final keyed agg
    df = qs["regression_by_segment"](spark, sf_dir)
    r = check_plan(df, require_broadcast_join=True, forbid_sortmerge_join=True)
    assert r.partial_final_agg


def test_ewma_window_is_key_partitioned_single_shuffle(spark, sf_dir, qs):
    # the EWMA window and the final rollup share the user_id partitioning
    df = qs["events_ewma_last"](spark, sf_dir)
    r = check_plan(df)  # forbids unpartitioned windows
    assert r.exchanges <= 2


def test_url_canonical_regex_chain_fuses_into_scan(spark, sf_dir, qs):
    # canonicalization is map-side: only the distinct-agg shuffles remain
    df = qs["url_canonical_dedup"](spark, sf_dir)
    r = check_plan(df)
    assert "Window" not in plan_text(df)
    assert r.exchanges <= 3


def test_pareto_windows_bucketed_no_cartesian(spark, sf_dir, qs):
    # local skyline windows must be bucket-partitioned; cross-bucket prune
    # and bounds are broadcast-sized
    df = qs["pareto_frontier_parts"](spark, sf_dir)
    check_plan(df)
    assert "CartesianProduct" not in plan_text(df)


def test_bloom_probe_is_broadcast_state_join(spark, sf_dir, qs):
    df = qs["bloom_state_merge_monthly"](spark, sf_dir)
    check_plan(df, require_broadcast_join=True)


def test_kmeans_centroid_joins_broadcast(spark, sf_dir, qs):
    # every per-iteration centroid join must broadcast the k*dim relation
    df = qs["kmeans_lloyd_clusters"](spark, sf_dir)
    r = check_plan(df, require_broadcast_join=True)
    assert not r.has_cartesian


def test_hits_and_negatives_plan_hygiene(spark, sf_dir, qs):
    for name in ("hits_hubs_authorities", "contrastive_negatives_sample"):
        df = qs[name](spark, sf_dir)
        check_plan(df)  # no cartesian, no unpartitioned window


def test_feature_hashing_single_keyed_count(spark, sf_dir, qs):
    # map-side explode+bucket; the only data-sized shuffle is the
    # (doc, bucket) count's partial->final exchange
    df = qs["feature_hashing_vectors"](spark, sf_dir)
    r = check_plan(df)
    assert r.partial_final_agg


def test_max_concurrency_window_type_partitioned(spark, sf_dir, qs):
    # the sweep-line running sum must be partitioned by event_type
    df = qs["max_concurrency_by_type"](spark, sf_dir)
    check_plan(df)  # forbids unpartitioned windows


def test_entity_resolution_no_cartesian_blocked_join(spark, sf_dir, qs):
    # pair generation must stay an equi-join on the block key
    df = qs["entity_resolution_pipeline"](spark, sf_dir)
    check_plan(df)
    assert "CartesianProduct" not in plan_text(df)


def test_trailing_range_window_key_partitioned(spark, sf_dir, qs):
    # the RANGE-interval frame must be user-partitioned and the rollup
    # reuse its partitioning
    df = qs["events_trailing_range_window"](spark, sf_dir)
    r = check_plan(df)
    assert r.exchanges <= 2


def test_pq_adc_broadcast_tables_take_ordered(spark, sf_dir, qs):
    # codebooks/distance tables must broadcast; top-k must TakeOrdered,
    # never globally sort
    df = qs["pq_adc_topk_embeddings"](spark, sf_dir)
    r = check_plan(df, require_broadcast_join=True)
    assert r.has_take_ordered


def test_wave3_plan_hygiene(spark, sf_dir, qs):
    for name in (
        "events_gapfill_lerp",
        "source_minhash_jaccard",
        "benford_digit_audit",
    ):
        df = qs[name](spark, sf_dir)
        check_plan(df)  # no cartesian, no unpartitioned window


def test_attribution_single_user_window(spark, sf_dir, qs):
    # the carry-forward must be user-partitioned; one window, no join
    df = qs["attribution_last_touch"](spark, sf_dir)
    r = check_plan(df)
    assert r.exchanges <= 2


def test_wave4_plan_hygiene(spark, sf_dir, qs):
    for name in ("gdpr_purge_audit", "attribution_first_touch"):
        df = qs[name](spark, sf_dir)
        check_plan(df)


def test_wave5_plan_hygiene(spark, sf_dir, qs):
    for name in ("basket_pair_lift", "cms_join_size_estimate"):
        df = qs[name](spark, sf_dir)
        check_plan(df)


def test_abc_prefix_sum_no_global_window(spark, sf_dir, qs):
    # the global cumulative must decompose into bucket-partitioned
    # windows + broadcast offsets — an unpartitioned window here would
    # single-task the whole parts relation
    df = qs["abc_classification_parts"](spark, sf_dir)
    check_plan(df)


def test_interval_union_windows_partitioned_no_selfjoin(spark, sf_dir, qs):
    """The sweep form must never fall back to the naive range self-join:
    no join at all in the plan, both windows user-partitioned."""
    df = qs["activity_coverage_union"](spark, sf_dir)
    check_plan(df)  # forbids unpartitioned windows / cartesian
    t = plan_text(df).lower()
    assert "join" not in t


def test_kanon_release_broadcast_split(spark, sf_dir, qs):
    """The small-cell relation is group-count-bounded and must broadcast
    into the semi/anti split — never a sort-merge of events vs events."""
    df = qs["kanon_release_daily"](spark, sf_dir)
    check_plan(df, forbid_sortmerge_join=True)
    assert "broadcasthashjoin" in plan_text(df).lower()


def test_cube_is_single_pass_expand(spark, sf_dir, qs):
    """CUBE must compile to one Expand + partial->final aggregate, not a
    union of per-grouping-set scans."""
    df = qs["cube_type_dow_totals"](spark, sf_dir)
    r = check_plan(df)
    t = plan_text(df).lower()
    assert "expand" in t
    assert r.partial_final_agg
    assert r.exchanges == 1  # one shuffle for ALL four grouping sets


def test_grid_radius_join_is_hash_equijoin_not_cartesian(spark, sf_dir, qs):
    """The neighbor-cell form must compile to a cell-keyed hash join —
    never a cartesian/broadcast-nested-loop theta join."""
    df = qs["grid_radius_pairs_events"](spark, sf_dir)
    check_plan(df)  # forbids cartesian products
    t = plan_text(df).lower()
    assert "broadcastnestedloop" not in t
    assert "hashjoin" in t


def _assert_no_payload_in_exchange(df):
    """Shared codec-plan gate: payload build + decode stay map-side.
    The ONE allowed exchange is the id-only RoundRobin spread BEFORE the
    payload build (codec cost is per ROW, not per byte, so a single
    small input file must not serialize the whole decode onto one core —
    guide §2.5 input skew); no exchange may ever carry the payload
    column itself."""
    import re

    t = plan_text(df)
    blocks = re.split(r"\n(?=\(\d+\) )", t)
    for b in blocks:
        if "Exchange" in b.split("\n", 1)[0]:
            assert "payload" not in b.lower(), (
                f"payload column flows through an exchange:\n{b[:400]}"
            )


def test_png_decode_real_is_map_only(spark, sf_dir, qs):
    """Real-codec decode must stay map-side AFTER the id spread: payload
    build and decode are chained mapInPandas stages over the
    repartitioned id scan — the only exchange carries media_id longs,
    never a payload byte."""
    df = qs["png_decode_real"](spark, sf_dir)
    _assert_no_payload_in_exchange(df)


def test_video_frame_sample_real_is_map_only(spark, sf_dir, qs):
    """The AVI build + parse + frame sampling must stay map-side after
    the id spread (the png_decode_real discipline): container payloads
    never cross a shuffle — only media_id longs (pre-build) and the
    small per-frame feature rows may."""
    df = qs["video_frame_sample_real"](spark, sf_dir)
    _assert_no_payload_in_exchange(df)


def test_audio_fingerprint_hashing_is_map_side(spark, sf_dir, qs):
    """Fingerprinting runs map-side with the decode; the ONLY shuffles in
    the near-dup query belong to the banding join/dedup over (8-byte
    hash, id) rows — no exchange may carry the payload column."""
    import re

    df = qs["audio_fingerprint_neardup"](spark, sf_dir)
    t = plan_text(df)
    assert "payload" in t.lower(), "expected the payload column in the plan"
    # formatted-explain node blocks: "(N) NodeName" header + detail lines
    blocks = re.split(r"\n(?=\(\d+\) )", t)
    exchange_blocks = [b for b in blocks if b.split("\n", 1)[0].strip().endswith(("Exchange", "Exchange [SinglePartition]")) or "Exchange" in b.split("\n", 1)[0]]
    assert exchange_blocks, "expected the banding join's exchanges"
    for b in exchange_blocks:
        assert "payload" not in b.lower(), (
            f"payload column flows through an exchange:\n{b[:400]}"
        )
