"""Deterministic 10x replication of an sf dir into a scratch dir (the
VERDICT r12 "measured 10x scale probe" dataset — item #1).

Reads /root/testdata/sf0.1 (read-only) and writes ~sf1 into
$SPARK_GRAFT_SCALE_DIR (default /tmp/modeltracking_sf1).  No RNG: copy
``i`` of each fact table gets key offsets of ``i * (max_key + 1)`` so
uniqueness and FK relations hold across copies, timestamps shift by
``i`` seconds so the overall time range (and hence window/watermark
shape) is preserved while rows stay distinct, and the two
similarity-bearing tables are decorrelated ACROSS copies while keeping
their WITHIN-copy structure:

- ``documents.text``: copy ``i`` appends ``~i`` to every whitespace
  token.  Within a copy, relative shingle overlap is unchanged (every
  doc gets the same rewrite), so the near-dup rate per shard matches
  sf0.1; across copies every shingle differs, so MinHash/SimHash do NOT
  see 10 spurious twins per doc.  A constant dup-RATE (not 10x-deeper
  dup clusters) is the realistic weak-scaling corpus — real 100 TB
  crawls do not contain ten byte-similar copies of every page.
- ``embeddings.embedding``: copy ``i`` cyclically rotates the vector by
  ``(7*i) % dim`` positions.  A fixed permutation is orthogonal, so all
  within-copy dot products / cosines are EXACTLY preserved (ANN
  structure per shard identical to sf0.1) while cross-copy cosine decays
  to noise.

Dims (region, nation) are copied once, as at every TPC-H scale factor.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

COPIES = 10
EMB_DIM = 64


#: 20 shared boilerplate tokens for the skewed mega-cluster
#: (SPARK_GRAFT_SCALE_SKEW, VERDICT r14 item 1): each cluster doc is
#: these 20 tokens plus ONE unique token, so token sets are distinct
#: (the identical-set collapse cannot absorb them), pairwise Jaccard is
#: 20/22 ≈ 0.91, and ~(20/21)^4 ≈ 82% of the cluster lands in a single
#: MinHash band bucket — the boilerplate near-identical shape the
#: decorrelated default fixture structurally cannot produce.
SKEW_BOILER = (
    "common boilerplate nav footer header copyright terms privacy "
    "cookie banner contact about sitemap login search share rss "
    "newsletter subscribe legal"
)


def build(spark, src: str, dst: str, copies: int = COPIES,
          tables: set | None = None, skew_cluster: int = 0) -> dict:
    """Materialize the replicated dataset; returns {table: rowcount}.

    ``tables`` (round 14, VERDICT r13 item 7) restricts the build to a
    subset — the 100x spot probe only needs the tables its
    scan-dominant queries read, and a full 100x lineitem would burn
    disk for nothing.  Dims always copy (they are cheap and several
    loaders probe them).

    ``skew_cluster=K`` (round 15, VERDICT r14 item 1) rewrites the
    first K doc_ids of EVERY copy into one mega-cluster of
    near-identicals (:data:`SKEW_BOILER` + a per-doc unique token),
    deliberately NOT cross-copy-decorrelated — the cluster grows as
    K·copies, so the LSH band buckets grow linearly with the corpus and
    an uncapped band self-join would go quadratic.  This is the fixture
    that makes the hot-bucket cap measurable."""

    def rd(name):
        return spark.read.parquet(f"{src}/{name}.parquet")

    def wr(df, name):
        # single FILE per table (not a part-file directory): the
        # testdata layout several sources/oracles open directly as a
        # file path.  Parquet files split by row group, so scan
        # parallelism at sf1 is unharmed.
        import glob
        import shutil

        tmp = f"{dst}/_tmp_{name}"
        # row-group geometry: keep groups at the sf0.1 file's size so
        # the 10x file carries ~10 groups — the shape a 10x-bigger
        # warehouse export actually has (and what row-group-grain
        # sources need for parallelism).  block.size is a flush
        # threshold on the writer's in-memory estimate, so this is
        # approximate, which is fine.
        src_sz = os.path.getsize(f"{src}/{name}.parquet")
        df.coalesce(1).write.mode("overwrite") \
            .option("parquet.block.size", str(max(1 << 20, src_sz))) \
            .parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        final = f"{dst}/{name}.parquet"
        if os.path.isdir(final):
            shutil.rmtree(final)
        shutil.move(part, final)
        shutil.rmtree(tmp)
        return spark.read.parquet(final).count()

    want = (lambda t: tables is None or t in tables)
    counts = {}
    for dim in ("region", "nation"):
        counts[dim] = wr(rd(dim), dim)

    def stride(df, key):
        return df.agg(F.max(key)).collect()[0][0] + 1

    cust, supp, part = rd("customer"), rd("supplier"), rd("part")
    orders, lineitem = rd("orders"), rd("lineitem")
    events, docs, emb = rd("events"), rd("documents"), rd("embeddings")
    s_c, s_s, s_p = stride(cust, "c_custkey"), stride(supp, "s_suppkey"), stride(part, "p_partkey")
    s_o, s_e, s_u = stride(orders, "o_orderkey"), stride(events, "event_id"), stride(events, "user_id")
    s_d, s_v = stride(docs, "doc_id"), stride(emb, "vec_id")

    def rep(df, cols_fn):
        parts = [df.select(*cols_fn(i)) for i in range(copies)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    counts["customer"] = None if not want("customer") else wr(rep(cust, lambda i: [
        (F.col("c_custkey") + i * s_c).alias("c_custkey"),
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]), "customer")
    counts["supplier"] = None if not want("supplier") else wr(rep(supp, lambda i: [
        (F.col("s_suppkey") + i * s_s).alias("s_suppkey"),
        "s_name", "s_nationkey", "s_acctbal"]), "supplier")
    counts["part"] = None if not want("part") else wr(rep(part, lambda i: [
        (F.col("p_partkey") + i * s_p).alias("p_partkey"),
        "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]), "part")
    counts["orders"] = None if not want("orders") else wr(rep(orders, lambda i: [
        (F.col("o_orderkey") + i * s_o).alias("o_orderkey"),
        (F.col("o_custkey") + i * s_c).alias("o_custkey"),
        "o_orderstatus", "o_totalprice",
        (F.col("o_orderdate") + F.expr(f"INTERVAL {i} SECOND")).alias("o_orderdate"),
        "o_orderpriority"]), "orders")
    counts["lineitem"] = None if not want("lineitem") else wr(rep(lineitem, lambda i: [
        (F.col("l_orderkey") + i * s_o).alias("l_orderkey"),
        (F.col("l_partkey") + i * s_p).alias("l_partkey"),
        (F.col("l_suppkey") + i * s_s).alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus",
        (F.col("l_shipdate") + F.expr(f"INTERVAL {i} SECOND")).alias("l_shipdate")]),
        "lineitem")
    counts["events"] = None if not want("events") else wr(rep(events, lambda i: [
        (F.col("event_id") + i * s_e).alias("event_id"),
        (F.col("ts") + F.expr(f"INTERVAL {i} SECOND")).alias("ts"),
        (F.col("user_id") + i * s_u).alias("user_id"),
        "event_type", "value", "props"]), "events")

    def doc_text(i):
        base = (
            F.col("text") if i == 0
            else F.regexp_replace("text", r"(\S+)", rf"$1~{i}")
        )
        if skew_cluster:
            return F.when(
                F.col("doc_id") < skew_cluster,
                F.concat(
                    F.lit(SKEW_BOILER + " uniq"),
                    (F.col("doc_id") + i * s_d).cast("string"),
                ),
            ).otherwise(base)
        return base

    counts["documents"] = None if not want("documents") else wr(rep(docs, lambda i: [
        (F.col("doc_id") + i * s_d).alias("doc_id"),
        doc_text(i).alias("text"), "lang", "source",
        F.length(doc_text(i)).cast("long").alias("n_chars")]), "documents")

    def rot(i):
        k = (7 * i) % EMB_DIM
        if k == 0:
            return F.col("embedding")
        return F.concat(F.slice("embedding", k + 1, EMB_DIM - k),
                        F.slice("embedding", 1, k))

    counts["embeddings"] = None if not want("embeddings") else wr(rep(emb, lambda i: [
        (F.col("vec_id") + i * s_v).alias("vec_id"),
        rot(i).alias("embedding"), "label"]), "embeddings")
    return counts


def main() -> int:
    src = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    dst = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/modeltracking_sf1")
    copies = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", str(COPIES)))
    tables_env = os.environ.get("SPARK_GRAFT_SCALE_TABLES")
    tables = set(tables_env.split(",")) if tables_env else None
    skew = int(os.environ.get("SPARK_GRAFT_SCALE_SKEW", "0"))
    from modeltracking_spark.session import get_spark

    spark = get_spark(app_name="modeltracking-make-scale")
    spark.sparkContext.setLogLevel("ERROR")
    counts = build(spark, src, dst, copies=copies, tables=tables,
                   skew_cluster=skew)
    import json

    with open(os.path.join(dst, "MANIFEST.json"), "w") as fh:
        json.dump({"src": src, "copies": copies, "rows": counts,
                   "skew_cluster": skew}, fh, indent=1)
    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
