"""Dump formatted physical plans for the r16-touched queries.

Usage: python tools/dump_r16_plans.py <tree_root> <suffix>
Writes plans/r16/<query>_<suffix>.txt under THIS repo (cwd-independent),
building each query's DataFrame against <tree_root>'s code.
"""

from __future__ import annotations

import os
import sys

QUERIES = [
    "minhash_lsh_pairs",
    "minhash_lsh_capped_pairs",
    "simhash_neardup_pairs",
    "lsh_bucket_overflow_stats",
    "jaccard_pairs_capped",
    "leakage_safe_split_docs",
    "dedup_clusters_docs",
    "dsir_select_docs",
    "pagerank_link_graph_docs",
    "personalized_pagerank_docs",
    "label_propagation_docs",
    "bm25_topk_docs",
    "cdc_chunk_dedup_docs",
    "dap_grid_mode_scan",
    "grid_netcdf_scan",
    "arrow_ipc_roundtrip_docs",
    "arrow_ipc_write_roundtrip_docs",
    "arrow_ipc_nested_scan_docs",
    "safetensors_roundtrip_embeddings",
    "npz_roundtrip_embeddings",
    "orc_lzo_lz4_write_docs",
    "parquet_summary_file_scan",
    "zstd_trained_dict_docs",
    "incremental_neardup_docs",
]


def main() -> int:
    tree = os.path.abspath(sys.argv[1])
    suffix = sys.argv[2]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, tree)
    os.chdir(tree)

    from modeltracking_spark.session import get_spark

    spark = get_spark(app_name=f"plans-r16-{suffix}", cpus="32",
                      extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(tree, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()
    for name in QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        try:
            df = fn(spark, "/root/testdata/sf0.1")
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # keep going; note the failure
            txt = f"PLAN DUMP FAILED: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
