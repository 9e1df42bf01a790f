"""Headline benchmark: runs representative queries from the registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Timing is STEADY-STATE: each query executes once untimed (Janino
whole-stage-codegen compilation + C2 JIT of the generated classes cost
~10s on the largest expression trees and are per-session one-offs — at
production scale they amortize to nothing), then the timed execution
runs the full plan into the noop v2 sink (all output columns
materialized; no driver-side collect) FIVE times, reporting the MEDIAN
(round 6; r3-r5 reported best-of-3). Single-shot numbers on this box
swing up to 3x on JIT/GC noise; the median of five steady-state runs is
robust to a single outlier in either direction, and the per-query
``spread`` (max/min of the five) is emitted alongside so a future
regression flag can be judged against the query's own measured variance
instead of guessed host noise. At sf0.1 the run also emits
``anchor_ratio`` — per-query current/r3 ratios against the frozen
anchor in BASELINE.md (the anchor was best-of-3; medians read slightly
higher by construction, so ratios are conservative).

``python bench.py --ab <git-ref>`` (round 12) runs the PAIRED A/B
protocol instead: the current tree and a worktree of <ref> each get a
live Spark JVM, timed executions strictly alternate between them, and
the output reports per-query medians plus the median of per-pair
cur/ref ratios — host-load drift hits both sides of every pair, so
round-over-round comparisons no longer depend on this box being
equally loaded on two different days.  ``SPARK_GRAFT_AB_ROUNDS`` and
``SPARK_GRAFT_AB_QUERIES`` (comma substrings) narrow the run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the headline set: one per operator family (scan/agg, window, join chain,
# as-of, profile pipeline, dedup, ANN, text, streaming-twin)
HEADLINE = [
    "flagship_events_daily",
    "pricing_summary",
    "topk_lineitems_per_order",
    "regional_revenue",
    "asof_nearest_clicks",
    "profile_along_track_temp",
    "minhash_lsh_pairs",
    "cosine_topk_brute",
    "text_metrics_docs",
    "tumbling_window_counts",
    # round-3 additions: rolling-hash fingerprints, IVF ANN, stateful stream
    "winnow_fingerprints_docs",
    "cosine_topk_ivf_probe",
    "stateful_user_totals_stream",
    # round-4 addition: simhash fingerprint + Hamming band join end-to-end
    "simhash_neardup_pairs",
    # round-5 additions: netCDF encode->sliced-decode->scan, Bloom
    # membership decontamination
    "grid_netcdf_scan",
    "bloom_decontaminate_docs",
    # round-6 additions: salted skew join, real from-spec BMP decode
    "skew_salted_join_events",
    "bmp_decode_stats_docs",
    # round-6 late additions: PQ compressed-corpus ANN (ADC + refine),
    # iterative PageRank, C4-style line-dedup rewrite
    "pq_refine_topk_l2",
    "pagerank_link_graph_docs",
    "line_dedup_rewrite_docs",
    # round-6 closing additions: BM25 retrieval, SemDeDup clustered
    # embedding scrub, in-engine logreg distillation, bucketed
    # exchange-free join
    "bm25_topk_docs",
    "semdedup_embeddings",
    "quality_logreg_docs",
    "bucketed_join_revenue",
    # round-7 additions (VERDICT r6 item 8): the remaining slowest
    # non-headline sweep queries, so regressions there are caught by
    # anchors rather than only by pytest — plus the new real baseline
    # JPEG decode path
    "compaction_plan_orders",
    "personalized_pagerank_docs",
    "dsir_select_docs",
    "jpeg_decode_stats_docs",
    # round-8 additions (VERDICT r7 item 7): anchor-track the rest of
    # the from-spec codec tier, not just JPEG
    "png_decode_stats_docs",
    "gif_frames_stats_docs",
    "adpcm_decode_stats_docs",
    # round-8 new operators: ExactSubstr-style duplicated-span scrub,
    # Aho-Corasick blocklist scan, per-key integer EWMA fold
    "dup_span_scrub_docs",
    "blocklist_match_docs",
    "ewma_user_values_events",
    # round-8 new codec: from-spec TIFF (none/LZW, multi-strip; r9 adds
    # PackBits/Predictor-2/big-endian arms to the same fixture family)
    "tiff_decode_stats_docs",
    # round-9 additions (VERDICT r8 item 7): anchor the CC-keyed
    # leakage-safe split and the Hamming-banded image near-dup tiers,
    # plus the new delta×corpus incremental image arm
    "leakage_safe_split_docs",
    "image_neardup_pairs_docs",
    "image_incremental_neardup_docs",
    # round-9 new operators: from-spec LZ4 + Snappy frame codecs,
    # from-spec bzip2 decode (stdlib-encoder cross-validation),
    # UAX #15 NFC normalization
    "lz4_roundtrip_docs",
    "snappy_roundtrip_docs",
    "bz2_roundtrip_docs",
    "nfc_normalize_docs",
    # round-9 closing additions: TIFF tile/palette arms, exactly-once
    # streaming ingest (real stream + deliberate replay)
    "tiff_tiled_palette_stats_docs",
    "exactly_once_ingest_events",
    # round-9 session-2 codec: from-spec LZMA decode (liblzma-encoder
    # cross-validation, lc/lp/pb matrix)
    "lzma_roundtrip_docs",
    # round-9 session-2 operators: content-defined chunking dedup,
    # KMV theta-sketch set operations, LPA communities, WARC scan
    "cdc_chunk_dedup_docs",
    "kmv_set_ops_users",
    "label_propagation_docs",
    "warc_gz_scan_docs",
    "warc_source_scan_docs",
    # round-9 session-2 flagship codec: from-spec zstd (RFC 8878),
    # cross-validated both directions against libzstd
    "zstd_roundtrip_docs",
    "tar_zst_bundle_scan_docs",
    "xz_roundtrip_docs",
    "sobel_edge_stats_docs",
    "data_quality_audit_orders",
    "avro_ocf_scan_docs",
    "robust_outliers_events",
    "tfrecord_example_scan_docs",
    "audio_activity_stats_docs",
    "cbor_roundtrip_docs",
    "idn_host_normalize_docs",
    # round-10 operators: zstd dictionaries (RFC 8878 §5), Avro nested
    # + reader-schema resolution, xz BCJ x86/delta filter chains, tar
    # pax extended headers, and the from-spec RFC 7932 brotli decoder
    "zstd_dict_roundtrip_docs",
    "avro_nested_scan_docs",
    "xz_bcj_roundtrip_docs",
    "tar_pax_bundle_scan_docs",
    "brotli_roundtrip_docs",
    # round-10 scale tier: COVER-style dictionary training, and the
    # frame/block/stream-parallel compressed-corpus scans
    "zstd_trained_dict_docs",
    "zstd_seekable_scan_docs",
    "xz_indexed_scan_docs",
    "bz2_multistream_scan_docs",
    # round-11 operators: the full Avro codec matrix, zlib FDICT
    # preset dictionaries, and the coalesced-range scan-tier knob
    # (xz_bcj_roundtrip_docs above now carries the 9-chain BCJ family)
    "avro_codec_matrix_docs",
    "zlib_fdict_roundtrip_docs",
    "zstd_seekable_coalesced_scan_docs",
    # round-11 flagship: the from-spec parquet + ORC readers
    # (footer-only planning, row-group/stripe partitions, byte-range
    # column pruning, Dremel list assembly, RLEv2)
    "parquet_native_scan_docs",
    "parquet_native_scan_embeddings",
    "orc_native_scan_docs",
    "orc_native_scan_events",
    # the writer direction: from-spec parquet encode, reference decode
    "parquet_native_write_docs",
    "parquet_native_sink_docs",
    "orc_native_write_docs",
    # round-12 operators: the parquet reader's DECIMAL / INT96 /
    # one-level-STRUCT arms and the ORC STRUCT arm (Spark-Java-written
    # fixtures, from-spec decode)
    "parquet_decimal_scan_orders",
    "parquet_int96_scan_events",
    "parquet_struct_scan_events",
    "orc_struct_scan_events",
    # round-12 flagship: page-level pruned scan off the written
    # ColumnIndex/OffsetIndex
    "parquet_page_pruned_scan_orders",
    # round-12 second wave: MAP / decimal / general-nesting scans
    # (Spark-Java-written fixtures, from-spec decode)
    "parquet_map_scan_events",
    "orc_decimal_scan_orders",
    "orc_map_scan_events",
    "parquet_nested_scan_events",
    "orc_nested_scan_events",
    "parquet_bloom_pruned_scan_orders",
    "orc_bloom_pruned_scan_orders",
    "safetensors_roundtrip_embeddings",
    "npz_roundtrip_embeddings",
    "arrow_ipc_roundtrip_docs",
    # round-13 operators: from-spec Arrow IPC WRITE (pyarrow reads
    # the engine's bytes) + dictionary-encoded read, the ORC UNION
    # arm, legacy BIT_PACKED parquet levels, and the DAP grid-mode
    # live-protocol scan
    "arrow_ipc_write_roundtrip_docs",
    "arrow_ipc_dict_scan_docs",
    "orc_union_scan_events",
    "arrow_ipc_fixed_scan_embeddings",
    "parquet_bitpacked_scan_orders",
    "dap_grid_mode_scan",
    # round-14 operators: Arrow IPC recursive nesting (read AND
    # write) + dictionary-encoded write with delta batches, DAP
    # String over the live protocol (per-file sequence endpoints),
    # and the hand-built legacy 2-level parquet lists
    "arrow_ipc_nested_scan_docs",
    "arrow_ipc_nested_write_docs",
    "arrow_ipc_dict_write_docs",
    "dap_string_sequence_scan",
    "parquet_legacy_list_scan",
    # round-15 operators: the LSH hot-bucket cap (binding-cap twins +
    # loud overflow accounting, VERDICT r14 item 1), Arrow IPC UNION
    # write (item 5) and dictionary-of-nested read (item 7)
    "minhash_lsh_capped_pairs",
    "lsh_bucket_overflow_stats",
    "embedding_neardup_capped_lsh",
    "arrow_ipc_union_write_docs",
    "arrow_ipc_dict_nested_scan_docs",
    "dap_scalar_summary_scan",
    "parquet_summary_file_scan",
    "orc_lzo_scan_docs",
    "arrow_ipc_modern_layouts_docs",
    "tiff_deflate_stats_docs",
    "orc_lzo_lz4_write_docs",
    "arrow_file_source_scan_docs",
    "sqlite_source_scan_docs",
    # zstd_seekable_stream_scan_docs, parquet_stream_sink_docs, and
    # orc_stream_sink_docs are deliberately NOT benched: each
    # execution runs two REAL streaming drains (~17 s at sf0.1),
    # which would dominate the 6-run timing loop; they stay oracled
    # and driver-scored, and their wall time is stream-startup, not
    # plan cost
]

# Regression anchor: BENCH_r03.json per-query seconds at sf0.1 on local[32]
# (the first parsed bench; frozen in BASELINE.md). Methodology: one untimed
# warmup execution, then best-of-2 timed runs into the noop sink — ratios
# are only computed when the current run uses the same sf.
ANCHOR_SF = 0.1
ANCHOR = {
    "flagship_events_daily": 0.467,
    "pricing_summary": 0.626,
    "topk_lineitems_per_order": 1.124,
    "regional_revenue": 0.783,
    "asof_nearest_clicks": 1.165,
    "profile_along_track_temp": 1.532,
    "minhash_lsh_pairs": 6.42,
    "cosine_topk_brute": 1.544,
    "text_metrics_docs": 0.644,
    "tumbling_window_counts": 0.374,
    "winnow_fingerprints_docs": 1.255,
    "cosine_topk_ivf_probe": 2.025,
    "stateful_user_totals_stream": 3.915,
}


def _runner() -> int:
    """Child protocol for --ab mode: one tree, one Spark session;
    reads ``WARM <q>`` / ``RUN <q>`` / ``EXIT`` lines on stdin and
    answers ``OK <sec>`` / ``ERR <msg>``.  The tree root comes from
    $SPARK_GRAFT_BENCH_TREE so the SAME runner source drives both
    trees (an old ref's bench.py may predate this mode)."""
    tree = os.environ["SPARK_GRAFT_BENCH_TREE"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, tree)
    os.chdir(tree)

    from modeltracking_spark.session import get_spark

    spark = get_spark(
        app_name=f"modeltracking-ab-{os.path.basename(tree)}",
        cpus=cpus,
        extra_conf={
            "spark.driver.memory": "12g",
            # two driver JVMs live at once: keep stores separate
            "spark.sql.warehouse.dir": f"/tmp/mt_ab_wh_{os.getpid()}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(tree, "__spark_entry__.py"))
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)
    qs = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print("READY", flush=True)
    for line in sys.stdin:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "EXIT":
            break
        cmd, name = parts[0], parts[1]
        if cmd == "HAS":
            print("OK 1" if name in qs else "OK 0", flush=True)
            continue
        try:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.time() - t0
            print(f"OK {dt:.4f}" if cmd == "RUN" else "OK 0",
                  flush=True)
        except Exception as exc:
            print(f"ERR {type(exc).__name__}: {exc}".replace("\n", " ")
                  [:300], flush=True)
    return 0


def _ab(ref: str) -> int:
    """Paired A/B bench (VERDICT r11 item 6): the current tree vs a
    pinned git ref, ONE timing session — two child Spark JVMs (one
    per tree, both warm for the whole run) with STRICTLY ALTERNATING
    timed executions, so any host-load drift hits both sides of every
    pair at the same wall-clock window.  Two processes (not one
    module-swapped session) because executor-side Python ships via
    addPyFile once per SparkContext — a shared session would run both
    trees' plans against ONE tree's executor code.  Reports per-query
    medians and the MEDIAN OF PER-PAIR RATIOS (cur/ref), which is the
    number regressions should be judged on."""
    import statistics
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    sha = subprocess.run(["git", "rev-parse", "--short", ref],
                         cwd=here, capture_output=True, text=True,
                         check=True).stdout.strip()
    wt = f"/tmp/modeltracking_ab_{sha}"
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", "--detach", wt, sha],
                       cwd=here, check=True, capture_output=True)

    def spawn(tree):
        env = dict(os.environ, SPARK_GRAFT_BENCH_TREE=tree)
        return subprocess.Popen(
            [sys.executable, os.path.join(here, "bench.py"),
             "--runner"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            env=env, text=True, bufsize=1,
            stderr=subprocess.DEVNULL)

    procs = {"cur": spawn(here), "ref": spawn(wt)}

    def wait_ready(p):
        while True:
            line = p.stdout.readline()
            if not line:
                raise RuntimeError("ab runner died before READY")
            if line.strip() == "READY":
                return

    def ask(p, cmd, name):
        p.stdin.write(f"{cmd} {name}\n")
        p.stdin.flush()
        line = p.stdout.readline().strip()
        if line.startswith("OK"):
            return float(line.split()[1])
        raise RuntimeError(line)

    for p in procs.values():
        wait_ready(p)
    results = {}
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "5"))
    only = os.environ.get("SPARK_GRAFT_AB_QUERIES")
    todo = ([q for q in HEADLINE
             if any(s in q for s in only.split(","))]
            if only else HEADLINE)
    for name in todo:
        try:
            if not (ask(procs["cur"], "HAS", name)
                    and ask(procs["ref"], "HAS", name)):
                continue  # only queries BOTH trees register pair up
            ask(procs["cur"], "WARM", name)
            ask(procs["ref"], "WARM", name)
            pairs = []
            for i in range(rounds):
                # alternate within-pair ORDER (r16): with cur always
                # first, a decaying host-load burst systematically
                # lands on cur — observed as per-pair ratios >1 while
                # cur's own median beat ref's. Order-alternation
                # cancels the first-runner bias.
                if i % 2:
                    b = ask(procs["ref"], "RUN", name)
                    a = ask(procs["cur"], "RUN", name)
                else:
                    a = ask(procs["cur"], "RUN", name)
                    b = ask(procs["ref"], "RUN", name)
                pairs.append((a, b))
            results[name] = {
                "cur": round(statistics.median(a for a, _ in pairs), 3),
                "ref": round(statistics.median(b for _, b in pairs), 3),
                "ratio": round(statistics.median(
                    a / max(b, 1e-9) for a, b in pairs), 3),
            }
        except Exception as exc:
            print(f"ab {name} failed: {exc}", file=sys.stderr)
            results[name] = {"cur": -1.0, "ref": -1.0, "ratio": -1.0}
    for p in procs.values():
        try:
            p.stdin.write("EXIT\n")
            p.stdin.flush()
            p.wait(timeout=60)
        except Exception:
            p.kill()
    ok = {n: r for n, r in results.items() if r["ratio"] > 0}
    ratios = sorted(r["ratio"] for r in ok.values())
    out = {
        "metric": "ab_paired_ratio",
        "ref": sha,
        "value": round(ratios[len(ratios) // 2], 3) if ratios else -1.0,
        "unit": "cur/ref",
        "cur_total": round(sum(r["cur"] for r in ok.values()), 3),
        "ref_total": round(sum(r["ref"] for r in ok.values()), 3),
        "queries": results,
        "sf": float(os.environ.get(
            "SPARK_GRAFT_SF_DIR",
            "/root/testdata/sf0.1").rstrip("/").rsplit("sf", 1)[-1]),
        "methodology": ("two-warm-JVM paired alternation, "
                        f"median-of-{rounds} per-pair ratios"),
    }
    print(json.dumps(out))
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    from modeltracking_spark.session import get_spark

    spark = get_spark(
        app_name="modeltracking-bench",
        cpus=cpus,
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # JVM/codegen warmup so the first timed query isn't charged for
    # session spin-up (results are NOT cached — only the JVM warms)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    times: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        try:
            # noop v2 sink: every output column is materialized (a bare
            # count() would let Catalyst prune projection-only queries)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(5):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            runs.sort()
            times[name] = round(runs[2], 3)  # median of 5
            spreads[name] = round(runs[-1] / max(runs[0], 1e-9), 2)
        except Exception as exc:  # pragma: no cover
            print(f"bench {name} failed: {exc}", file=sys.stderr)
            times[name] = -1.0
    total = round(sum(t for t in times.values() if t >= 0), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "spread": spreads,
        "sf": sf,
        "methodology": "warmup+median-of-5,noop-sink",
    }
    if sf == ANCHOR_SF:
        # delta vs the frozen r3 anchor: ratio > 1 is slower than r3
        out["anchor_ratio"] = {
            n: round(times[n] / ANCHOR[n], 2)
            for n in times
            if n in ANCHOR and times[n] >= 0
        }
        for n, r in out["anchor_ratio"].items():
            if r > 1.5:
                print(
                    f"bench REGRESSION {n}: {r}x of r3 anchor "
                    f"(query's own run-to-run spread this session: "
                    f"{spreads.get(n)}x)",
                    file=sys.stderr,
                )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    if "--runner" in sys.argv:
        raise SystemExit(_runner())
    if "--ab" in sys.argv:
        raise SystemExit(_ab(sys.argv[sys.argv.index("--ab") + 1]))
    raise SystemExit(main())
