"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-catalog pipeline (decode -> metadata ->
item assembly -> PIP join -> tile assignment -> extent aggregate) over an
images table deterministically derived from the sf0.001 testdata.

``queries()`` / ``oracle_sql()`` cover the operator inventory of SURVEY.md §2
plus the training-data operators (dedup, text analysis, ANN); each oracle is
ANSI SQL DuckDB runs on the same parquet tables.  Rows-only entries (no
oracle) are the genuinely non-SQL-expressible ops (MinHash-LSH, SimHash,
catalog JSON assembly).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stac_catalog_builder_ray.geo.cell import cell_encode_sql  # noqa: E402
from stac_catalog_builder_ray.pipelines import geospatial as G  # noqa: E402
from stac_catalog_builder_ray.pipelines import relational as R  # noqa: E402
from stac_catalog_builder_ray.pipelines import text as T  # noqa: E402


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; returns the item Dataset."""
    from stac_catalog_builder_ray.pipelines.spatial_catalog import (
        images_from_documents,
        index_and_join,
    )

    images = images_from_documents("/root/testdata/sf0.001", "/tmp/scbr-cache")
    res = index_and_join(images, out_root=None, checkpoint=False)
    return res["items"]


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # scans / projections / scalar functions
        "filter_project": R.q_filter_project,
        "string_ops": R.q_string_ops,
        "month_end": R.q_month_end,
        # aggregates
        "pricing_summary": R.q_pricing_summary,
        "minmax_by_year": R.q_minmax_by_year,
        "count_by_type": R.q_count_by_type,
        "duplicate_ids": R.q_duplicate_ids,
        # joins
        "join_broadcast": R.q_join_broadcast,
        "small_qty_revenue": R.q_small_qty_revenue,
        "join_hash": R.q_join_hash,
        "anti_join": R.q_anti_join,
        "semi_join": R.q_semi_join,
        "semi_join_bloom": R.q_semi_join_bloom,
        "skew_join": R.q_skew_join,
        "profile_events": R.q_profile_events,
        "snapshot_diff": R.q_snapshot_diff,
        "merge_apply": R.q_merge_apply,
        "cooccur_join": R.q_cooccur_join,
        "fk_integrity": R.q_fk_integrity,
        "global_rank": R.q_global_rank,
        "pagerank": R.q_pagerank,
        "group_regression": R.q_group_regression,
        "er_join": R.q_er_join,
        "outlier_trim": R.q_outlier_trim,
        "event_transitions": R.q_event_transitions,
        "time_weighted_avg": R.q_time_weighted_avg,
        "funnel": R.q_funnel,
        "sliding_count": R.q_sliding_count,
        "hll_registers": R.q_hll_registers,
        "copurchase": R.q_copurchase,
        "table_digest": R.q_table_digest,
        "weighted_sample": R.q_weighted_sample,
        # dedup / sort / union
        "dedup_first": R.q_dedup_first,
        "top_orders": R.q_top_orders,
        "union_names": R.q_union_names,
        # windows / streaming-shaped
        "running_sum": R.q_running_sum,
        "hourly_window": R.q_hourly_window,
        # json flatten + word explode
        "json_extract": R.q_json_extract,
        "word_freq": R.q_word_freq,
        # composite join / sessions / skew
        "shipping_priority": R.q_shipping_priority,
        "sessionize": R.q_sessionize,
        "user_journey": R.q_user_journey,
        "throttle_dedup": R.q_throttle_dedup,
        "trajectory_len": R.q_trajectory_len,
        "traj_simplify": R.q_traj_simplify,
        "traj_hull": R.q_traj_hull,
        "salted_agg": R.q_salted_agg,
        "asof_join": R.q_asof_join,
        "topk_per_group": R.q_topk_per_group,
        "grouped_quantiles": R.q_grouped_quantiles,
        "distinct_sketch": R.q_distinct_sketch,
        "cm_counts": R.q_cm_counts,
        "interval_join": R.q_interval_join,
        "moving_avg": R.q_moving_avg,
        "pivot_events": R.q_pivot_events,
        "rollup_counts": R.q_rollup_counts,
        "intersect_except": R.q_intersect_except,
        "stratified_sample": R.q_stratified_sample,
        "split_assign": R.q_split_assign,
        "cube_counts": R.q_cube_counts,
        "gap_fill": R.q_gap_fill,
        "edit1_join": R.q_edit1_join,
        "day_gaps": R.q_day_gaps,
        "returned_revenue": R.q_returned_revenue,
        "distinct_users": R.q_distinct_users,
        "percent_rank": R.q_percent_rank,
        "run_lengths": R.q_run_lengths,
        "source_overlap": R.q_source_overlap,
        "quantile_sketch": R.q_quantile_sketch,
        # round-4 late additions: grouped stats / histogram / growth curve
        "corr_by_group": R.q_corr_by_group,
        "grouped_mode": R.q_grouped_mode,
        "histogram": R.q_histogram,
        "entropy_by_group": R.q_entropy_by_group,
        "new_users_daily": R.q_new_users_daily,
        "retention": R.q_retention,
        "heavy_hitters": T.q_heavy_hitters,
        "skyline": R.q_skyline,
        "mutual_information": R.q_mutual_information,
        "idw": G.q_idw,
        "balanced_resample": T.q_balanced_resample,
        "mad_by_group": R.q_mad_by_group,
        "feature_hash": T.q_feature_hash,
        "degree_hist": G.q_degree_hist,
        "standardize_by_group": R.q_standardize_by_group,
        "string_agg": R.q_string_agg,
        "drawdown": R.q_drawdown,
        "ohlc": R.q_ohlc,
        "embed_cov": T.q_embed_cov,
        "target_encode": R.q_target_encode,
        "ntile": R.q_ntile,
        "wmedian": R.q_wmedian,
        "scd2": R.q_scd2,
        "dod_growth": R.q_dod_growth,
        "interarrival_hist": R.q_interarrival_hist,
        "rfm": R.q_rfm,
        "kmv_setops": R.q_kmv_setops,
        "late_arrivals": R.q_late_arrivals,
        "seasonal_residuals": R.q_seasonal_residuals,
        "peak_concurrency": R.q_peak_concurrency,
        "grouped_sample_n": R.q_grouped_sample_n,
        "gini": R.q_gini,
        "winnow_pairs": T.q_winnow_pairs,
        "cluster_terms": T.q_cluster_terms,
        "trending_terms": T.q_trending_terms,
        "vocab_growth": T.q_vocab_growth,
        "bigram_pmi": T.q_bigram_pmi,
        "embed_pca": T.q_embed_pca,
        # geospatial (north rule)
        "cell_index": G.q_cell_index,
        "pip_join": G.q_pip_join,
        "knn": G.q_knn,
        "tile_assign": G.q_tile_assign,
        "cell_extents": G.q_cell_extents,
        "zonal_stats": G.q_zonal_stats,
        "pixel_histogram": G.q_pixel_histogram,
        "patch_stats": G.q_patch_stats,
        "overview": G.q_overview,
        "caption_check": G.q_caption_check,
        "radius_join": G.q_radius_join,
        "rect_join": G.q_rect_join,
        "cell_compact": G.q_cell_compact,
        "coverage_gaps": G.q_coverage_gaps,
        "kring_smooth": G.q_kring_smooth,
        "image_stats": G.q_image_stats,
        "change_detect": G.q_change_detect,
        "image_sim": G.q_image_sim,
        "dbscan": G.q_dbscan,
        "triangles": G.q_triangles,
        "hotspot_cells": G.q_hotspot_cells,
        "iou_join": G.q_iou_join,
        "dwell_points": G.q_dwell_points,
        "augment_digest": G.q_augment_digest,
        "nearest_aoi": G.q_nearest_aoi,
        "kcore": G.q_kcore,
        "clustering_coeff": G.q_clustering_coeff,
        "bfs_hops": G.q_bfs_hops,
        "cell_mosaic": G.q_cell_mosaic,
        "od_matrix": G.q_od_matrix,
        "morans_i": G.q_morans_i,
        "zorder_index": G.q_zorder_index,
        "zrange_query": G.q_zrange_query,
        "blob_count": G.q_blob_count,
        "otsu": G.q_otsu,
        "lof": G.q_lof,
        "distinctive_terms": T.q_distinctive_terms,
        "frame_sample": G.q_frame_sample,
        # text analysis / dedup / similarity (training-data ops)
        "token_count": T.q_token_count,
        "quality_score": T.q_quality_score,
        "dedup_exact_text": T.q_dedup_exact_text,
        "ngram_jaccard_pairs": T.q_ngram_jaccard_pairs,
        "langid": T.q_langid,
        "minhash_dedup": T.q_minhash_dedup,
        "neardup_cluster": T.q_neardup_cluster,
        "simhash": T.q_simhash,
        "bm25": T.q_bm25,
        "bigram_xent": T.q_bigram_xent,
        "fingerprint": T.q_fingerprint,
        "tfidf_top_terms": T.q_tfidf_top_terms,
        "gopher_quality": T.q_gopher_quality,
        "pii_redact": T.q_pii_redact,
        "bigram_topk": T.q_bigram_topk,
        "dup_ngrams": T.q_dup_ngrams,
        "vocab_oov": T.q_vocab_oov,
        "label_centroids": T.q_label_centroids,
        "leakage_safe_split": T.q_leakage_safe_split,
        "per_source_cap": T.q_per_source_cap,
        "seq_pack": T.q_seq_pack,
        "lang_confusion": T.q_lang_confusion,
        "compress_ratio": T.q_compress_ratio,
        "ann_cosine": T.q_ann_cosine,
        "ann_ivf": T.q_ann_ivf,
        "pq_ann": T.q_pq_ann,
        "embedding_dedup": T.q_embedding_dedup,
        "embed_quantize": T.q_embed_quantize,
        "kmeans": T.q_kmeans,
        "image_neardup_cluster": T.q_image_neardup_cluster,
        "decontaminate": T.q_decontaminate,
        "stopword_filter": T.q_stopword_filter,
        "mixture_sample": T.q_mixture_sample,
        "semdedup": T.q_semdedup,
        "chunk_docs": T.q_chunk_docs,
        "inverted_index": T.q_inverted_index,
        "training_manifest": T.q_training_manifest,
        "dim_stats": T.q_dim_stats,
    }


_LON, _LAT = G.lonlat_sql("event_id")
_PTS = f"SELECT event_id, {_LON} AS lon, {_LAT} AS lat FROM events"
_CELL6 = cell_encode_sql("lon", "lat", 6)
_CELL4 = cell_encode_sql("lon", "lat", 4)


def oracle_sql() -> dict[str, str]:
    return {
        "filter_project": (
            "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS revenue "
            "FROM lineitem WHERE l_quantity > 45"
        ),
        "string_ops": (
            "SELECT p_partkey, 's3://bucket/parts/' || CAST(p_partkey AS VARCHAR) || '.dat' AS href, "
            "upper(p_name) AS name_upper, "
            "CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num FROM part"
        ),
        "month_end": (
            "SELECT o_orderkey, CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) "
            "+ INTERVAL 86399 SECOND AS month_end FROM orders"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_price_cents, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents, "
            "ROUND(AVG(l_quantity), 2) AS avg_qty, COUNT(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "minmax_by_year": (
            "SELECT year(o_orderdate) AS o_year, MIN(o_totalprice) AS min_price, "
            "MAX(o_totalprice) AS max_price, COUNT(*) AS n_orders FROM orders GROUP BY 1"
        ),
        "count_by_type": "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
        "duplicate_ids": (
            "SELECT user_id, event_type, COUNT(*) AS n FROM events "
            "GROUP BY 1, 2 HAVING COUNT(*) > 5"
        ),
        "join_broadcast": (
            "SELECT o_orderkey, o_custkey, o_totalprice, c_name FROM orders "
            "JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING'"
        ),
        "join_hash": (
            "SELECT year(o_orderdate) AS o_year, o_orderpriority, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) "
            "AS revenue_cents, COUNT(*) AS n_lines "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2"
        ),
        "anti_join": (
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)"
        ),
        "semi_join": (
            "SELECT p_partkey, p_name FROM part "
            "WHERE p_partkey IN (SELECT l_partkey FROM lineitem)"
        ),
        "dedup_first": (
            "SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts FROM ("
            "SELECT *, row_number() OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1"
        ),
        "top_orders": (
            "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "union_names": (
            "SELECT r_name AS name, 'region' AS src FROM region "
            "UNION ALL SELECT n_name AS name, 'nation' AS src FROM nation"
        ),
        "running_sum": (
            "SELECT event_id, user_id, CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS running_value_e4 FROM events"
        ),
        "hourly_window": (
            "SELECT user_id, date_trunc('hour', ts) AS window_start, "
            "CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_value_e4, "
            "COUNT(*) AS n_events FROM events GROUP BY 1, 2"
        ),
        "json_extract": (
            "SELECT event_id, CAST(coalesce(json_extract(props, '$.k'), '-1') AS BIGINT) AS k "
            "FROM events"
        ),
        "word_freq": (
            "SELECT word, COUNT(*) AS n FROM (SELECT unnest(regexp_split_to_array("
            "lower(trim(text)), '\\s+')) AS word FROM documents WHERE trim(text) <> '') "
            "GROUP BY word"
        ),
        "shipping_priority": (
            "SELECT l_orderkey, CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) "
            "AS BIGINT)) AS BIGINT) AS revenue_cents FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' GROUP BY l_orderkey "
            "ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"
        ),
        "sessionize": (
            "WITH e AS (SELECT user_id, ts, event_id, CASE WHEN "
            "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 1800 SECOND "
            "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS new_s "
            "FROM events), "
            "s AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM e) "
            "SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events, "
            "CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT) AS duration_us "
            "FROM s GROUP BY user_id, sid"
        ),
        "salted_agg": (
            "SELECT event_type, CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT) "
            "AS sum_value_e4, COUNT(*) AS n FROM events GROUP BY event_type"
        ),
        "asof_join": R.SQL_ASOF_JOIN,
        "user_journey": R.SQL_USER_JOURNEY,
        "throttle_dedup": R.SQL_THROTTLE_DEDUP,
        "trajectory_len": R.SQL_TRAJECTORY_LEN,
        "traj_hull": R.SQL_TRAJ_HULL,
        "topk_per_group": R.SQL_TOPK_PER_GROUP,
        "grouped_quantiles": R.SQL_GROUPED_QUANTILES,
        "distinct_sketch": R.SQL_DISTINCT_SKETCH,
        "cm_counts": R.SQL_CM_COUNTS,
        "interval_join": R.SQL_INTERVAL_JOIN,
        "moving_avg": R.SQL_MOVING_AVG,
        "pivot_events": R.SQL_PIVOT_EVENTS,
        "rollup_counts": R.SQL_ROLLUP_COUNTS,
        "intersect_except": R.SQL_INTERSECT_EXCEPT,
        "stratified_sample": R.SQL_STRATIFIED_SAMPLE,
        "split_assign": R.SQL_SPLIT_ASSIGN,
        "cube_counts": R.SQL_CUBE_COUNTS,
        "gap_fill": R.SQL_GAP_FILL,
        "edit1_join": R.SQL_EDIT1_JOIN,
        "day_gaps": R.SQL_DAY_GAPS,
        "returned_revenue": R.SQL_RETURNED_REVENUE,
        "distinct_users": R.SQL_DISTINCT_USERS,
        "percent_rank": R.SQL_PERCENT_RANK,
        "corr_by_group": R.SQL_CORR_BY_GROUP,
        "grouped_mode": R.SQL_GROUPED_MODE,
        "histogram": R.SQL_HISTOGRAM,
        "entropy_by_group": R.SQL_ENTROPY_BY_GROUP,
        "new_users_daily": R.SQL_NEW_USERS_DAILY,
        "retention": R.SQL_RETENTION,
        "heavy_hitters": T.SQL_HEAVY_HITTERS,
        "skyline": R.SQL_SKYLINE,
        "mutual_information": R.SQL_MUTUAL_INFORMATION,
        "idw": G.idw_sql(),
        "balanced_resample": T.SQL_BALANCED_RESAMPLE,
        "mad_by_group": R.SQL_MAD_BY_GROUP,
        "feature_hash": T.SQL_FEATURE_HASH,
        "degree_hist": G.degree_hist_sql(),
        "standardize_by_group": R.SQL_STANDARDIZE_BY_GROUP,
        "string_agg": R.SQL_STRING_AGG,
        "drawdown": R.SQL_DRAWDOWN,
        "ohlc": R.SQL_OHLC,
        "embed_cov": T.SQL_EMBED_COV,
        "target_encode": R.SQL_TARGET_ENCODE,
        "ntile": R.SQL_NTILE,
        "distinctive_terms": T.distinctive_terms_sql(),
        "wmedian": R.SQL_WMEDIAN,
        "scd2": R.SQL_SCD2,
        "dod_growth": R.SQL_DOD_GROWTH,
        "interarrival_hist": R.SQL_INTERARRIVAL_HIST,
        "rfm": R.SQL_RFM,
        "kmv_setops": R.kmv_setops_sql(),
        "late_arrivals": R.SQL_LATE_ARRIVALS,
        "seasonal_residuals": R.SQL_SEASONAL_RESIDUALS,
        "peak_concurrency": R.SQL_PEAK_CONCURRENCY,
        "grouped_sample_n": R.grouped_sample_n_sql(),
        "gini": R.SQL_GINI,
        "winnow_pairs": T.winnow_pairs_sql(),
        "cluster_terms": T.cluster_terms_sql(),
        "trending_terms": T.trending_terms_sql(),
        "vocab_growth": T.vocab_growth_sql(),
        "bigram_pmi": T.bigram_pmi_sql(),
        "run_lengths": R.SQL_RUN_LENGTHS,
        "source_overlap": R.SQL_SOURCE_OVERLAP,
        "cell_index": f"WITH pts AS ({_PTS}) SELECT event_id, {_CELL6} AS cell FROM pts",
        "pip_join": (
            f"WITH pts AS ({_PTS}) SELECT event_id, a.aoi_id FROM pts, (VALUES "
            "('aoi_world', -180.0, -90.0, 180.0, 90.0), "
            "('aoi_mid', -30.0, -20.0, 30.0, 20.0), "
            "('aoi_ne', 100.0, 40.0, 170.0, 85.0)) AS a(aoi_id, w, s, e, n) "
            "WHERE lon BETWEEN a.w AND a.e AND lat BETWEEN a.s AND a.n"
        ),
        "knn": (
            f"WITH pts AS ({_PTS}) SELECT event_id, neighbor_id FROM ("
            "SELECT q.event_id, c.event_id AS neighbor_id, row_number() OVER ("
            "PARTITION BY q.event_id ORDER BY "
            "((q.lon - c.lon) * (q.lon - c.lon) + (q.lat - c.lat) * (q.lat - c.lat)), c.event_id) AS rn "
            "FROM pts q JOIN pts c ON c.event_id <> q.event_id "
            f"WHERE q.event_id % {G.KNN_QUERY_MOD} = 0) WHERE rn <= {G.KNN_K}"
        ),
        "tile_assign": (
            f"WITH pts AS ({_PTS}), boxes AS (SELECT event_id, "
            f"GREATEST(0, LEAST(CAST(floor((lon - {G.FOOT_DLON} + 180.0) / 360.0 * 64) AS BIGINT), 63)) AS x0, "
            f"GREATEST(0, LEAST(CAST(floor((lon + {G.FOOT_DLON} + 180.0) / 360.0 * 64) AS BIGINT), 63)) AS x1, "
            f"GREATEST(0, LEAST(CAST(floor((lat - {G.FOOT_DLAT} + 90.0) / 180.0 * 64) AS BIGINT), 63)) AS y0, "
            f"GREATEST(0, LEAST(CAST(floor((lat + {G.FOOT_DLAT} + 90.0) / 180.0 * 64) AS BIGINT), 63)) AS y1 "
            "FROM pts), "
            "xs AS (SELECT event_id, unnest(generate_series(x0, x1)) AS x, y0, y1 FROM boxes), "
            "xy AS (SELECT event_id, x, unnest(generate_series(y0, y1)) AS y FROM xs) "
            "SELECT event_id, ((CAST(6 AS BIGINT) << 58) | (x << 29) | y) AS tile_cell FROM xy"
        ),
        "cell_extents": (
            f"WITH pts AS ({_PTS}) SELECT {_CELL4} AS cell, COUNT(*) AS n_points, "
            "MIN(lon) AS west, MIN(lat) AS south, MAX(lon) AS east, MAX(lat) AS north "
            "FROM pts GROUP BY 1"
        ),
        "radius_join": G.radius_join_sql(),
        "small_qty_revenue": R.SQL_SMALL_QTY_REVENUE,
        "semi_join_bloom": R.SQL_SEMI_JOIN_BLOOM,
        "skew_join": R.SQL_SKEW_JOIN,
        "profile_events": R.SQL_PROFILE_EVENTS,
        "snapshot_diff": R.SQL_SNAPSHOT_DIFF,
        "merge_apply": R.SQL_MERGE_APPLY,
        "cooccur_join": R.SQL_COOCCUR_JOIN,
        "fk_integrity": R.SQL_FK_INTEGRITY,
        "global_rank": R.SQL_GLOBAL_RANK,
        "pagerank": R.pagerank_sql(),
        "group_regression": R.SQL_GROUP_REGRESSION,
        "er_join": R.SQL_ER_JOIN,
        "outlier_trim": R.SQL_OUTLIER_TRIM,
        "event_transitions": R.SQL_EVENT_TRANSITIONS,
        "time_weighted_avg": R.SQL_TIME_WEIGHTED_AVG,
        "funnel": R.SQL_FUNNEL,
        "sliding_count": R.SQL_SLIDING_COUNT,
        "hll_registers": R.hll_registers_sql(),
        "copurchase": R.SQL_COPURCHASE,
        "table_digest": R.table_digest_sql(),
        "weighted_sample": R.weighted_sample_sql(),
        "rect_join": G.rect_join_sql(),
        "cell_compact": G.cell_compact_sql(),
        "coverage_gaps": G.coverage_gaps_sql(),
        "kring_smooth": G.kring_smooth_sql(),
        "dbscan": G.dbscan_sql(),
        "triangles": G.triangles_sql(),
        "hotspot_cells": G.hotspot_cells_sql(),
        "iou_join": G.iou_join_sql(),
        "dwell_points": G.dwell_points_sql(),
        "nearest_aoi": G.nearest_aoi_sql(),
        "kcore": G.kcore_sql(),
        "clustering_coeff": G.clustering_coeff_sql(),
        "bfs_hops": G.bfs_hops_sql(),
        "cell_mosaic": G.cell_mosaic_sql(),
        "od_matrix": G.od_matrix_sql(),
        "morans_i": G.morans_i_sql(),
        "zorder_index": G.zorder_index_sql(),
        "zrange_query": G.zrange_query_sql(),
        "token_count": T.SQL_TOKEN_COUNT,
        "quality_score": T.SQL_QUALITY_SCORE,
        "dedup_exact_text": T.SQL_DEDUP_EXACT,
        "ngram_jaccard_pairs": T.SQL_NGRAM_JACCARD,
        "langid": T.SQL_LANGID,
        "bm25": T.bm25_sql(),
        "bigram_xent": T.bigram_xent_sql(),
        "neardup_cluster": T.SQL_NEARDUP_CLUSTER,
        "tfidf_top_terms": T.SQL_TFIDF_TOP_TERMS,
        "gopher_quality": T.SQL_GOPHER_QUALITY,
        "pii_redact": T.SQL_PII_REDACT,
        "bigram_topk": T.SQL_BIGRAM_TOPK,
        "dup_ngrams": T.SQL_DUP_NGRAMS,
        "vocab_oov": T.SQL_VOCAB_OOV,
        "label_centroids": T.SQL_LABEL_CENTROIDS,
        "leakage_safe_split": T.sql_leakage_safe_split(),
        "per_source_cap": T.sql_per_source_cap(),
        "seq_pack": T.SQL_SEQ_PACK,
        "lang_confusion": T.SQL_LANG_CONFUSION,
        "embed_quantize": T.SQL_EMBED_QUANTIZE,
        "decontaminate": T.SQL_DECONTAMINATE,
        "stopword_filter": T.SQL_STOPWORD_FILTER,
        "mixture_sample": T._sql_mixture_sample(),
        "chunk_docs": T.SQL_CHUNK_DOCS,
        "inverted_index": T.SQL_INVERTED_INDEX,
        "training_manifest": T._sql_training_manifest(),
        "dim_stats": T.SQL_DIM_STATS,
        # minhash_dedup / simhash / fingerprint / ann_cosine / embedding_dedup:
        # genuinely non-SQL-expressible (hash permutations / bit ops on binary
        # sketches / float matmul) -> rows-only checks
    }
