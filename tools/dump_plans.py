"""Regenerate PLANS.md: formatted physical plans of the headline queries
with a one-line posture note each — the scale-evidence artifact the
plan tests assert programmatically.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    "flagship_events_daily": "one hash aggregate; scan prunes to 3 of 6 columns",
    "pricing_summary": "shipdate filter pushed to the parquet scan",
    "positional_projection": "PushedFilters + 4-column ReadSchema of 11",
    "asof_nearest_clicks": "union-and-window: shuffles on user_id only, no cross product",
    "profile_along_track_temp": "track side broadcast; grid streams once; single hash exchange",
    "minhash_lsh_pairs": "banded candidates (no all-pairs); array-intersect verify",
    "cosine_topk_brute": "query side broadcast; corpus streams; window top-k",
    "regional_revenue": "dimension sides broadcast",
    "winnow_fingerprints_docs": "shuffle-free narrow map (ArrowEvalPython + final explode only)",
    "pack_sequences_chunk": "exactly one hashpartitioning exchange on the bucket key; no global window",
    "hash_split_docs": "shuffle-free projection (md5 bucket arithmetic)",
    "stream_enrich_join": "static dimension broadcast; single aggregate exchange",
    "decontaminate_ngram_overlap": "benchmark grams broadcast; corpus side streams through one explode",
    "bloom_decontaminate_docs": "bit-position and benchmark-hash sides broadcast; probe side streams",
    "unigram_logprob_docs": "vocabulary-sized LM broadcast; one explode + one aggregate exchange",
    "cosine_topk_lsh_probe": "probe side broadcast onto (table, sig) buckets; no all-pairs",
    "grid_netcdf_scan": "one InputPartition per timestep record range; single aggregate exchange",
    "simhash_neardup_pairs": "fingerprints checkpointed once, band self-join reads the materialized table twice",
    "skew_salted_join_events": "fact side salted 8 ways (join keys include __salt — the hot-key spread), salt-replicated dimension broadcast; one aggregate exchange after",
    "bmp_decode_stats_docs": "two narrow ArrowEvalPython/mapInPandas stages (encode, decode) — shuffle-free end to end",
    "jpeg_decode_stats_docs": "narrow mapInPandas encode+decode of the entropy-coded baseline stream — shuffle-free end to end; payload bytes never leave the executor",
    "jpeg_color_decode_stats_docs": "narrow mapInPandas encode+decode of the 3-component 4:2:0 interleaved-MCU stream — shuffle-free end to end",
    "png_decode_stats_docs": "narrow mapInPandas encode+decode (DEFLATE + per-row filters + CRC) — shuffle-free end to end",
    "mulaw_decode_stats_docs": "narrow mapInPandas G.711 container build + expansion — shuffle-free end to end",
    "gif_decode_stats_docs": "narrow mapInPandas LZW encode+decode — shuffle-free end to end",
    "adpcm_decode_stats_docs": "narrow mapInPandas stateful nibble decode — shuffle-free; state is per-payload, never crosses rows",
    "txlog_snapshot_orders": "log replay is driver-side METADATA (bounded by checkpoint interval); the data path is one parquet scan over exactly the live files + one aggregate exchange per arm",
    "unigram_viterbi_docs": "one corpus n-gram aggregate (bounded vocab broadcast as closure); DP per DISTINCT word in mapInPandas; occurrences hash-join back",
    "hll_distinct_users": "bounded 4096-register aggregate joined to a constant spine; exact integer harmonic sum; 1-row output",
    "gif_frames_stats_docs": "narrow mapInPandas animation decode, 1 row -> n_frames rows — shuffle-free",
    "grid_netcdf_packed_scan": "one InputPartition per timestep record range over the 1/4-size packed file; CF unpack is a narrow numpy map inside the partition read",
    "jpeg_progressive_decode_stats_docs": "narrow mapInPandas five-scan progressive encode+decode — shuffle-free end to end",
    "classifier_eval_suite": "one corpus conditional aggregate + one bounded per-score aggregate + a window over the bounded score table; 1-row output",
    "deterministic_shuffle_docs": "two-pass global rank: bounded bucket-offset table broadcast, full data ranks under a __bucket-partitioned window (no single-partition sort of the corpus)",
    "pii_redact_docs": "pure narrow map — regexp counts + chained redaction in one codegen projection, zero exchanges",
    "wav_decode_stats_docs": "narrow mapInPandas encode+decode, shuffle-free",
    "y4m_frame_stats_docs": "narrow mapInPandas encode+decode (1 row -> n_frames rows), shuffle-free",
    "line_dedup_rewrite_docs": "keep-first rank under a segment-hash-partitioned window (one corpus-wide exchange); doc-spine left join preserves empty docs",
    "temperature_mix_sample_docs": "stratum-threshold side broadcast onto a narrow filter; no full-data shuffle before the summary aggregate",
    "pagerank_link_graph_docs": "per iteration: edges-scores join + dst aggregate, both hash-partitioned on node keys; node count and dangling mass broadcast",
    "pq_adc_topk_l2": "narrow encode pass; serve = codes posexplode + BROADCAST query LUT join + one (q,c) aggregate — JVM-side after encoding",
    "pq_refine_topk_l2": "ADC shortlist feeds a raw-vector join bounded to |q| x shortlist rows; exact re-rank is a JVM zip_with integer fold",
    "gopher_rules_docs": "verdict + fail bitmask in one shuffle-free codegen projection",
    "curation_pipeline_docs": "filter fused into scan side; segment-hash window + content-hash dedup both hash-partitioned; one summary aggregate",
    "bigram_logprob_docs": "pair table checkpointed once for its two consumers; LM joined by hash join on (x,y), unigram/total sides broadcast",
    "bpe_first_merge_pairs": "corpus-scale word count; ranking window on the alphabet^2-bounded pair table",
    "grouped_agg_median_prices": "GROUPED_AGG Arrow UDF: one hash-partitioned exchange on the group key",
    "profile_columns_lineitem": "16 measures in a single aggregate pass; stack unpivot after",
    "bmp_resize_stats_docs": "narrow mapInPandas encode+decode+resize, shuffle-free",
    "wav_decimate_stats_docs": "narrow mapInPandas encode+decode+decimate, shuffle-free",
    "html_extract_main_text": "regex container isolation + tag strip in one codegen projection, zero exchanges",
    "url_canonicalize_docs": "parse/filter/sort/rebuild as pure column expressions, shuffle-free",
    "jsonl_roundtrip_scan": "json file scan with explicit schema (no inference pass); FAILFAST parse",
    "orc_roundtrip_scan": "orc file scan with explicit schema; exact-inverse md5 attestation",
    "incremental_neardup_docs": "delta band/set tables broadcast onto the corpus side; candidates cross the boundary only (no corpus self-join)",
    "zorder_layout_grid": "plan-time Morton bit interleave; rank window on the bounded distinct-cell table",
    "bm25_topk_docs": "query set/vocab/df/stats all broadcast; (doc,term) tf aggregate is the only corpus shuffle; rank window partitioned by q_id",
    "dsir_select_docs": "1024-row hashed LMs broadcast; two-pass bucket-offset global rank (full data windows under hashpartitioning(__b), only the bounded bucket table serializes)",
    "semdedup_embeddings": "cluster assignment localCheckpointed once (pandas-UDF scoring runs once, not per join side); pair scrub equi-joins on cid; sizes broadcast",
    "partition_prune_events": "PartitionFilters prune 3 of ~30 day directories; ReadSchema prunes to 2 data columns",
    # ---- round-9 session-2 additions ----
    "lzma_roundtrip_docs": "narrow mapInPandas encode(liblzma)+from-spec-decode, widened when under-split, shuffle-free",
    "zstd_roundtrip_docs": "narrow mapInPandas reference-encode + from-spec RFC 8878 decode, shuffle-free",
    "xz_roundtrip_docs": "narrow mapInPandas liblzma-encode + from-spec xz/LZMA2 decode (all container CRCs verified), shuffle-free",
    "tar_zst_bundle_scan_docs": "two chained narrow maps (bundle build, zstd+tar walk) — zero exchanges",
    "warc_gz_scan_docs": "two chained narrow maps (archive build, member-split+parse), zero exchanges",
    "warc_source_scan_docs": "Python DataSource: one InputPartition per .warc.gz shard, record_type pruned inside the reader",
    "avro_ocf_scan_docs": "Python DataSource: one InputPartition per .avro shard; deflate blocks decode via from-spec inflate",
    "tfrecord_example_scan_docs": "two chained narrow maps (Example build, TFRecord parse with both masked CRCs), zero exchanges",
    "cdc_chunk_dedup_docs": "narrow chunk kernel (widened), ONE chunk-md5-grain aggregate discovers sharing, join-back + per-doc aggregate — never all-pairs",
    "kmv_set_ops_users": "distinct + WindowGroupLimit rank<=k (partial top-k BEFORE the group exchange); pair combinator is a broadcast nested-loop over the bounded sketch table",
    "label_propagation_docs": "per round: edges-labels join + (node,label) count + min(struct) argmax, all hash-partitioned on node keys; no window operator",
    "orc_partitioned_orders_scan": "ORC read-back answers the status filter via PartitionFilters (directory pruning)",
    "sobel_edge_stats_docs": "narrow mapInPandas decode+integer-convolution, shuffle-free",
    "audio_activity_stats_docs": "narrow mapInPandas decode+ZCR/energy, shuffle-free",
    "data_quality_audit_orders": "ALL scalar constraints compiled into ONE aggregate executed once (bounded 1-row collect); referential check = broadcast anti-join",
    "robust_outliers_events": "two rank passes (row_number + group count) pick exact medians without collecting group values; joins and final aggregate hash-partitioned on the group key",
    "bucketed_join_revenue": "pre-bucketed sort-merge join: zero exchanges below the join (sort-free under the SPARK-28632 opt-in); one aggregate exchange after",
    "cms_user_counts": "depth x width bounded sketch aggregate broadcast back onto the 20-row probe set",
    "distinct_estimate_users": "one bounded occupancy aggregate; no per-key state",
    "merge_upsert_docs": "union + ONE per-key window (hash-partitioned on doc_id) — no wide full-outer coalesce",
    "quality_logreg_docs": "per GD iteration: one map-side-combinable gradient aggregate + 1-row weight broadcast; scoring is a narrow map",
    "hist_quantiles_events": "1-row min/max broadcast; bounded 64-bin count aggregate; cumulative window only over the bin table",
    "scd2_history_docs": "current slice full-outer-joins the delta on the key (hash-partitioned); closed history unions in without re-shuffling",
    "weighted_sample_docs": "narrow priority projection + TakeOrderedAndProject top-k (per-partition heaps, no global sort); rank window over k rows",
    "triangle_counts_docs": "canonical-orientation edge dedup, two hash equi-joins (never all-pairs), member-credit aggregate",
    "inverted_index_docs": "one (doc,term)-distinct shuffle + per-term aggregate with sorted canonical postings",
    "funnel_conversion_events": "three chained per-user min aggregates joined on user_id; 1-row count outputs",
    "mmr_diverse_topk": "bounded candidate table localCheckpointed; greedy steps join candidate-sized tables only — the corpus never re-enters",
    "retention_cohorts_events": "per-user min cohort aggregate joined back; distinct week-offset pairs then one matrix aggregate",
    "rolling_active_users_events": "day-grain (user, day) dedupe FIRST; raw events never enter the 7-day lag join against the bounded day spine",
    "event_transitions_markov": "one per-user lag window + 25-cell aggregate; row totals broadcast",
    "point_in_polygon_customers": "region polygons broadcast; points stream through one integer-arithmetic projection — no shuffle of the point side",
    "track_resample_arclength": "track-sized segment table broadcast under the target range join; windows over the 80-row track only",
    "zscore_standardize_events": "exact-moment aggregate broadcast back onto a narrow per-row map",
    "mad_outliers_events": "two hash-partitioned rank-window median passes (deliberately NOT the GROUPED_AGG UDF); median/MAD tables broadcast; integer verdict filter",
    "feature_hash_docs": "pure narrow projection, shuffle-free",
    "target_encode_events": "one bounded category aggregate broadcast onto a narrow map",
    "data_quality_events": "six rules, TWO jobs: one conditional-aggregate pass over the fact scan + one FK-probe join",
    "compaction_plan_orders": "file-metadata aggregate (partition-sized) into the per-month applyInPandas first-fit fold",
    "pca_top_component_embeddings": "distributed dim^2-grain covariance aggregate; only the 64x64 matrix is collected; iterations are driver-planned over it",
    "edit_distance_pairs_docs": "both sides hash-partition on the (lang, band) block key; prefix-window Levenshtein only inside blocks",
    "textrank_segments_docs": "doc-partitioned segment self-join (bounded by doc length); per-iteration score checkpointed; never corpus-quadratic",
    "winsorize_events": "bounded sketch aggregate -> 1-row caps broadcast -> narrow clamp",
    "pearson_corr_events": "one map-side-combinable moment aggregate per group",
    "chi2_type_vs_weekday_events": "bounded contingency counts; row/col margins broadcast back onto the cells",
    # round 10
    "zstd_dict_roundtrip_docs": "narrow Arrow map (widen-guard RoundRobin only); dictionary is a closure-captured broadcast-sized artifact",
    "avro_nested_scan_docs": "narrow Arrow map: per-batch OCF write -> reader-schema-resolved read, no shuffle",
    "xz_bcj_roundtrip_docs": "narrow Arrow map; filter-chain decode per row, no shuffle",
    "tar_pax_bundle_scan_docs": "two chained narrow Arrow maps (bundle build -> scan), no shuffle",
    "brotli_roundtrip_docs": "narrow Arrow map; RFC 7932 decode per row, no shuffle",
    "zstd_trained_dict_docs": "one map-side-combinable gram aggregate + one bounded segment-score shuffle over the SAMPLE; corpus pass is a narrow Arrow map",
    "zstd_seekable_scan_docs": "BatchScan with one InputPartition per FRAME (range reads only) -> project; no exchange",
    "xz_indexed_scan_docs": "BatchScan with one InputPartition per BLOCK via the format's own index -> project; no exchange",
    "bz2_multistream_scan_docs": "BatchScan with one InputPartition per STREAM -> project; no exchange",
    "zstd_seekable_stream_scan_docs": "two availableNow streaming drains (one partition per NEW frame, offsets from tail-only seek-table reads) land in an exactly-once file sink; the returned plan is the committed parquet scan",
    # round 11
    "zstd_seekable_coalesced_scan_docs": "BatchScan with CONTIGUOUS frames coalesced into >=target_partition_bytes range partitions (one seek + one contiguous read each) -> project; no exchange — partition count scales with bytes/target, not frame count",
    "avro_codec_matrix_docs": "narrow Arrow map: per-(codec, batch) OCF write -> from-spec decode across all six spec codecs, no shuffle",
    "zlib_fdict_roundtrip_docs": "narrow Arrow map; FDICT preset-dictionary roundtrip per row, dictionary closure-broadcast, no shuffle",
    "parquet_native_scan_docs": "BatchScan with one InputPartition per ROW GROUP, footer-only planning, byte-range column pruning (3 of 5 columns read) -> project; no exchange",
    "parquet_native_write_docs": "narrow Arrow map (from-spec parquet ENCODE per codec group -> pyarrow + own-reader decode), no shuffle; per-batch files = the one-file-per-partition sink shape",
    "parquet_native_sink_docs": "distributed write through the Python DataSource writer (executor-side from-spec encode, temp-dir + driver-rename 2-phase commit) -> JVM parquet scan of the output; one round-robin exchange sizes the output files",
    "orc_native_write_docs": "narrow Arrow map (from-spec ORC ENCODE per codec group -> pyarrow.orc + own-reader decode incl. TIMESTAMP streams), no shuffle",
    "parquet_stream_sink_docs": "two REAL streaming drains through the per-epoch two-phase sink (executor-side from-spec encode, _epochs idempotence log) -> JVM parquet scan of the committed output",
    "parquet_native_scan_embeddings": "BatchScan (Dremel list assembly) -> JVM-side size/aggregate over array<float>; no Python after the scan, no exchange",
    "orc_native_scan_docs": "BatchScan with one InputPartition per STRIPE, stream-level projection (3 of 4 columns) -> project; no exchange",
    "orc_native_scan_events": "BatchScan per stripe; PRESENT-driven null assembly + zstd chunk framing decode inside the source; no exchange",
    # round 12
    "parquet_decimal_scan_orders": "BatchScan (footer-only planning) -> JVM-side exact decimal-to-integer projection; DECIMAL columns excluded from stats pruning by design; no exchange",
    "parquet_int96_scan_events": "BatchScan per row group; INT96 12-byte pairs decode to epoch micros inside the source; pure project after, no exchange",
    "parquet_struct_scan_events": "BatchScan per row group; per-leaf chunk reads + def-level struct assembly inside the source; JVM-side field dereference, no exchange",
    "orc_struct_scan_events": "BatchScan per stripe; parent-presence child decode inside the source; JVM-side field dereference, no exchange",
    "orc_stream_sink_docs": "two REAL streaming drains through the per-epoch two-phase ORC sink (executor-side from-spec encode incl. stripe statistics, _epochs idempotence log) -> JVM ORC scan of the committed output",
    "parquet_page_pruned_scan_orders": "BatchScan: footer zone maps prune row groups at planning; inside survivors the reader consumes ColumnIndex/OffsetIndex to read ONLY matching pages (byte ranges; unkept pages never read or decoded) and trims rows to the surviving ranges; Spark re-applies the predicate row-level",
    # round 12, second wave
    "parquet_map_scan_events": "BatchScan per row group; both key_value leaf chunks decode inside the source and zip into MapType; JVM-side try_element_at/size after, no exchange",
    "orc_decimal_scan_orders": "BatchScan per stripe; unbounded-varint mantissa + per-value scale decode inside the source; JVM-side exact decimal-to-integer projection, no exchange",
    "orc_map_scan_events": "BatchScan per stripe; LENGTH-driven entry split + per-side child decode inside the source; JVM-side try_element_at/size after, no exchange",
    "parquet_nested_scan_events": "BatchScan per row group; GENERAL Dremel assembly (per-leaf skeletons + tree merge) inside the source; JVM-side nested dereference after, no exchange",
    "orc_nested_scan_events": "BatchScan per stripe; presence-based recursive decode (PRESENT at each level, LENGTH on containers) inside the source; JVM-side nested dereference after, no exchange",
    "parquet_bloom_pruned_scan_orders": "planning-time SBBF probe: row groups whose blooms prove every IN value absent never become partitions (present probe keeps exactly one); Spark re-applies the predicate row-level",
    "orc_bloom_pruned_scan_orders": "planning-time ORC bloom probe over BLOOM_FILTER_UTF8 streams: stripes proving all values absent never become partitions",
    "safetensors_roundtrip_embeddings": "narrow mapInPandas build->from-spec-parse per Arrow batch, shuffle-free; blobs never leave the executor",
    "npz_roundtrip_embeddings": "narrow mapInPandas from-spec npz build->parse per Arrow batch, shuffle-free",
    "arrow_ipc_roundtrip_docs": "narrow mapInPandas reference-encode (pyarrow, zstd bodies) -> from-spec flatbuffers walk per batch, shuffle-free",
    "arrow_ipc_write_roundtrip_docs": "narrow mapInPandas: from-spec flatbuffers EMIT (file format, zstd bodies via own encoder) -> pyarrow reference read per batch, shuffle-free",
    "arrow_ipc_dict_scan_docs": "narrow mapInPandas: pyarrow dictionary-encodes lang/source (int8/int16 indices, deltas on) -> from-spec DictionaryBatch resolve per batch, shuffle-free",
    "arrow_ipc_fixed_scan_embeddings": "narrow mapInPandas: pyarrow fixed_size_list<float32,64> + large_utf8 with lz4 bodies -> from-spec fixed-window decode, shuffle-free",
    "orc_union_scan_events": "stripe-grain partitions over the pyarrow-written union fixture; per-variant tag-count decode; JVM-side tagged-struct dereference; no shuffle before the sink",
    "parquet_bitpacked_scan_orders": "row-group-grain partitions; MSB-first legacy level decode executor-side; no shuffle before the sink",
    "dap_grid_mode_scan": "one InputPartition per timestep; each fetches ONE hyperslab record over the live DAP protocol (qualified grid-array projection); single aggregate exchange",
    "arrow_ipc_nested_scan_docs": "narrow mapInPandas: pyarrow writes list<struct>/struct-of-struct/map<utf8,list> (zstd bodies) -> from-spec RECURSIVE pre-order FieldNode walk per batch, shuffle-free",
    "arrow_ipc_nested_write_docs": "narrow mapInPandas: from-spec recursive _enc_array EMITS the nested tree (file fmt, lz4 bodies) -> pyarrow reference read per batch, shuffle-free",
    "arrow_ipc_dict_write_docs": "narrow mapInPandas: from-spec dictionary-encoded EMIT (int8/int16 indices, initial + isDelta batches across chunks) -> pyarrow resolves deltas per batch, shuffle-free",
    "dap_string_sequence_scan": "one endpoint per partition (part{i}.nc!obs per-file sequences); each partition drives the live protocol: String sequence decode + CHAR-as-String array fetch through a percent-encoded hyperslab; no exchange",
    "parquet_legacy_list_scan": "row-group-grain partitions over hand-built legacy 2-level bytes; both backward-compat shapes normalize to standard Dremel list nodes executor-side; no shuffle before the sink",
    "minhash_lsh_capped_pairs": "banded rep-level candidates with the hot-bucket cap BINDING: oversized (band, band_key) buckets carve out via broadcast anti/semi joins and chain under a bucket-partitioned lead window (linear, never k^2); small buckets keep the exact self-join",
    "lsh_bucket_overflow_stats": "two map-side-combinable aggregates over bucket sizes (never the pairs); 4-row output",
    "embedding_neardup_capped_lsh": "hyperplane bucket join with oversized (tbl, sig) buckets broadcast-anti-joined out and replaced by id-ordered adjacent chains; exact fixed-point cosine verifies every surviving candidate",
    "arrow_ipc_union_write_docs": "narrow mapInPandas: from-spec union EMIT (dense offset compaction + sparse full-length children, V5 no-validity, typeIds [5,9]/[3,4] preserved, lz4 file fmt) -> pyarrow reference read per batch, shuffle-free",
    "arrow_ipc_dict_nested_scan_docs": "narrow mapInPandas: pyarrow DictionaryArray.from_arrays emits dict-of-list + dict-of-struct (zstd) -> DictionaryBatch delivers the nested value tree through the recursive walker; batches stay index arrays, shuffle-free",
    "dap_scalar_summary_scan": "one endpoint per partition; each drives the live protocol's 0-dim framing (bare counted string / bare 4-padded value, no (n,n) header); 4-row output, no exchange",
    "parquet_summary_file_scan": "narrow mapInPandas: engine writes data.parquet (self-referencing file_path) + metadata-only summary twin per batch; rows decode THROUGH the summary via the sibling byte-range redirect, shuffle-free",
    "orc_lzo_scan_docs": "stripe-grain partitions over the Spark-written LZO fixture; from-spec LZO1X chunk decode executor-side with column projection; no shuffle before the sink",
    "sqlite_source_scan_docs": "catalog-only planning (header + root pages); one InputPartition per (shard, B-tree root-child subtree); record decode executor-side, no shuffle before the sink",
    "arrow_file_source_scan_docs": "footer-only planning (TAIL reads); one InputPartition per record-batch Block, target_partition_bytes groups consecutive batches; decode-side projection skips the unprojected source column's zstd frames entirely; one aggregate-free narrow scan",
    "orc_lzo_lz4_write_docs": "narrow mapInPandas: per batch the engine writes one LZO + one LZ4 ORC file (chunked 3-byte framing over the from-spec encoders) and pyarrow.orc re-decodes both; shuffle-free, write parallelizes per partition",
    "tiff_deflate_stats_docs": "one Arrow mapInPandas kernel over doc_id only (column-pruned scan): formula raster -> strip/tile zlib streams -> from-spec inflate under the TIFF framing, lossless roundtrip asserted per row; shuffle-free",
    "arrow_ipc_modern_layouts_docs": "narrow mapInPandas, both directions per batch: engine writes Utf8View/BinaryView/ListView/REE (variadic buffer counts, offsets+sizes pairs, run_ends children) -> pyarrow full-validates; pyarrow writes view/REE -> from-spec reader decodes, cross-checked in-kernel; shuffle-free",
}


def main() -> int:
    from modeltracking_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = [
        "# PLANS — executed physical plans of the headline queries (sf0.01)",
        "",
        "Generated by `python tools/dump_plans.py`. The properties below are",
        "asserted programmatically in `tests/test_scale_plans.py`; this file",
        "is the human-readable evidence.",
        "",
    ]
    for name, note in NOTES.items():
        df = qs[name](spark, "/root/testdata/sf0.01")
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", f"*{note}*", "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
