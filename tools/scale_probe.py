"""Measured scale probe (VERDICT r12 item #1): run the HEADLINE bench
set at sf0.1 AND at the self-generated ~sf1 dir (tools/make_scale_data.py)
and record per-query scaling, writing SCALE_r13.json at the repo root.

Methodology: ONE Spark session (local[$SPARK_GRAFT_CPUS], the bench
config), per (query, sf): one untimed warm execution (JIT + fixture
materialization — fixtures are content-addressed per corpus, so the sf1
family builds once), then THREE timed executions into the noop v2 sink,
median reported.  ``plan_s`` separately times the DataFrame-construction
call — for the from-spec sources that is where driver-side footer
parsing / partition planning happens, which item #1 singles out.

``exponent`` is log10(t_big/t_small) per 10x rows: 1.0 = linear, <1 =
sublinear (fixed overhead amortizing), >1 = superlinear (flag).  The
headline wall at sf0.1 includes 0.2-1 s of fixed per-query overhead
(session round-trips, stream startup for the streaming twins), so
ratios well BELOW 10 are expected; the probe's red line is the
VERDICT's "wall ratio <~12x for 10x rows".
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TIMED_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))


def run_set(spark, qs, names, sf_dir, plan_only=False):
    out = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            first_call_s = time.time() - t0
            # steady-state planning: the SECOND construction — the
            # first call may materialize content-addressed fixtures
            # (a one-off), which must not be billed as driver-side
            # planning (the r13 probe's first pass conflated them)
            t0 = time.time()
            df = fn(spark, sf_dir)
            plan_s = time.time() - t0
            if plan_only:
                out[name] = {"plan_s": round(plan_s, 3),
                             "first_call_s": round(first_call_s, 3)}
                print(f"  {name}: plan {plan_s:.3f}s "
                      f"(first call {first_call_s:.3f}s)", flush=True)
                continue
            df.write.format("noop").mode("overwrite").save()  # warm
            runs = []
            for _ in range(TIMED_RUNS):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            out[name] = {
                "t": round(statistics.median(runs), 3),
                "spread": round(max(runs) / max(min(runs), 1e-9), 2),
                "plan_s": round(plan_s, 3),
                "first_call_s": round(first_call_s, 3),
            }
            print(f"  {name}: {out[name]['t']}s (plan {out[name]['plan_s']}s)",
                  flush=True)
        except Exception as exc:
            print(f"  {name} FAILED: {type(exc).__name__}: {exc}"[:300],
                  flush=True)
            out[name] = {"t": -1.0, "spread": -1.0, "plan_s": -1.0,
                         "err": f"{type(exc).__name__}: {exc}"[:200]}
    return out


def main() -> int:
    small = os.environ.get("SPARK_GRAFT_SCALE_SMALL", "/root/testdata/sf0.1")
    big = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/modeltracking_sf1")
    out_path = os.environ.get(
        "SPARK_GRAFT_SCALE_OUT", os.path.join(HERE, "SCALE_r13.json"))
    from modeltracking_spark.session import get_spark

    spark = get_spark(
        app_name="modeltracking-scale-probe",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(HERE, "__spark_entry__.py"))
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)
    qs = entrymod.queries()
    bench_spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(HERE, "bench.py"))
    benchmod = importlib.util.module_from_spec(bench_spec)
    bench_spec.loader.exec_module(benchmod)
    names = benchmod.HEADLINE
    only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    if only:
        subs = [s for s in only.split(",") if s]
        names = [n for n in names if any(s in n for s in subs)]
    plan_only = os.environ.get("SPARK_GRAFT_SCALE_MODE") == "plan"
    merge = os.environ.get("SPARK_GRAFT_SCALE_MERGE") == "1"

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"== small ({small}) ==", flush=True)
    rs = run_set(spark, qs, names, small, plan_only)
    print(f"== big ({big}) ==", flush=True)
    rb = run_set(spark, qs, names, big, plan_only)

    if plan_only or merge:
        # merge the re-measured fields into the existing receipt
        with open(out_path) as fh:
            prev = json.load(fh)
        for name in names:
            a, b = rs.get(name), rb.get(name)
            if a is None or b is None:
                continue
            ent = prev["queries"].setdefault(name, {})
            ent["plan_sf0.1"] = a["plan_s"]
            ent["plan_sf1"] = b["plan_s"]
            ent["first_call_sf0.1"] = a["first_call_s"]
            ent["first_call_sf1"] = b["first_call_s"]
            if not plan_only:
                import math

                ent["t_sf0.1"] = a["t"]
                ent["t_sf1"] = b["t"]
                ent["spread_sf0.1"] = a["spread"]
                ent["spread_sf1"] = b["spread"]
                if a["t"] > 0 and b["t"] > 0:
                    ent["ratio"] = round(b["t"] / a["t"], 2)
                    ent["exponent"] = round(
                        math.log10(max(b["t"] / a["t"], 1e-9)), 3)
        ok = [q for q in prev["queries"].values()
              if q.get("ratio", -1) > 0]
        prev["total_sf0.1"] = round(sum(q["t_sf0.1"] for q in ok), 1)
        prev["total_sf1"] = round(sum(q["t_sf1"] for q in ok), 1)
        prev["median_ratio"] = round(
            statistics.median(q["ratio"] for q in ok), 2) if ok else -1.0
        prev["max_ratio"] = max((q["ratio"] for q in ok), default=-1.0)
        factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
        prev["red_line"] = "ratio > 1.2 * rows_factor"
        prev["superlinear"] = {
            n: q["ratio"] for n, q in prev["queries"].items()
            if q.get("ratio", -1) > 1.2 * factor}
        prev["n_queries"] = len(ok)
        prev["n_failed"] = len(prev["queries"]) - len(ok)
        with open(out_path, "w") as fh:
            json.dump(prev, fh, indent=1)
        print(json.dumps({k: prev[k] for k in
                          ("median_ratio", "max_ratio",
                           "superlinear")}))
        return 0

    queries = {}
    for name in names:
        a, b = rs.get(name), rb.get(name)
        if a is None or b is None:
            continue
        ent = {"t_sf0.1": a["t"], "t_sf1": b["t"],
               "plan_sf0.1": a["plan_s"], "plan_sf1": b["plan_s"],
               "spread_sf0.1": a["spread"], "spread_sf1": b["spread"]}
        if a["t"] > 0 and b["t"] > 0:
            import math

            ent["ratio"] = round(b["t"] / a["t"], 2)
            ent["exponent"] = round(math.log10(max(b["t"] / a["t"], 1e-9)), 3)
        else:
            ent["ratio"] = -1.0
            ent["err"] = a.get("err") or b.get("err")
        queries[name] = ent
    ok = [q for q in queries.values() if q["ratio"] > 0]
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    superlinear = {n: q["ratio"] for n, q in queries.items()
                   if q["ratio"] > 1.2 * factor}
    out = {
        "metric": f"scale_probe_{factor}x",
        "sf_small": 0.1,
        "sf_big": round(0.1 * factor, 1),
        "rows_factor": factor,
        "total_sf0.1": round(sum(q["t_sf0.1"] for q in ok), 1),
        "total_sf1": round(sum(q["t_sf1"] for q in ok), 1),
        "median_ratio": round(statistics.median(q["ratio"] for q in ok), 2)
        if ok else -1.0,
        "max_ratio": max((q["ratio"] for q in ok), default=-1.0),
        "superlinear": superlinear,
        "red_line": "ratio > 1.2 * rows_factor",
        "n_queries": len(ok),
        "n_failed": len(queries) - len(ok),
        "timed_runs": TIMED_RUNS,
        "queries": queries,
        "methodology": ("one warm + median-of-3 noop-sink executions per "
                        "(query, sf) in one session; plan_s times DataFrame "
                        "construction (driver-side source planning); big dir "
                        "from tools/make_scale_data.py (10x deterministic "
                        "replication, cross-copy-decorrelated text/embeddings)"),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("total_sf0.1", "total_sf1", "median_ratio",
                       "max_ratio", "superlinear", "n_failed")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
