#!/usr/bin/env python3
"""The repeatable x27 DuckDB parity gate (r12 verdict ask #4 made a tool).

The driver's hard correctness gate runs at sf0.01; this gate re-checks a
representative oracle subset at x27 (the scale where the engine/oracle
asymmetry becomes physical: DuckDB REPLAYS subquadratic plans
quadratically — assignment CTEs as cross joins, CC as recursive
fixpoints — so a full 273-oracle pass projects to >10 h of DuckDB time).

End-to-end recipe (each step is one command):

  1. sbt -batch "runMain graft.tools.AmplifyCorpus /root/testdata/sf0.1 /tmp/x27 27"
  2. SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=48g \
       sbt -batch "runMain graft.Verify /tmp/x27 /tmp/verify_x27"
  3. python3 tools/parity_x27.py /tmp/x27 /tmp/verify_x27

Policy (exactly the r12 run, committed):
  - the SUBSET list below spans every family (the r12 54-oracle list +
    the r13 two-level IVF-PQ pair);
  - each oracle runs on a FRESH DuckDB connection with an explicit
    memory_limit — an interrupted query was observed to poison later
    allocations (OOM cascade) on a shared connection;
  - each oracle gets a wall BUDGET (default 900 s); on timeout it is
    RETRIED UNBOUNDED on another fresh connection (r12: only
    corpus_dedup_stable's double-corpus recursive replay needed this; it
    completed and matched).

Usage: python3 tools/parity_x27.py <x27Dir> <verifyOutDir>
         [--budget SECONDS] [--memory-limit 24GB] [--only a,b,c]
"""
import sys, json, os, glob, time, argparse, threading
import duckdb

# The committed parity subset: every operator family is represented; the
# quadratic-replay heavyweights (recursive CC, suffix sort, signatures
# per-pair) are IN, because they are the reason the gate exists.
SUBSET = [
    # OHLCV core + gap fill
    "ohlcv_1m", "ohlcv_1d", "ohlcv_1h_from_1m", "candle_upsert",
    "incomplete_drop", "gap_detect", "gap_fill", "gap_fill_linear",
    "resume_since", "candle_stats",
    # indicators / studies
    "vwap", "ema", "rsi", "macd", "atr", "max_drawdown", "rolling_corr",
    "ichimoku", "volume_bars",
    # events: sessionization / funnels / retention
    "sessionize", "session_stats", "funnel_3stage", "retention_cohorts",
    "asof_join", "event_transitions",
    # TPC-H style OLAP
    "q1_pricing", "q3_revenue", "q5_region", "q9_profit", "q18_large_orders",
    "rollup_sales", "approx_percentiles",
    # dedup family (the recursive-CC heavyweights)
    "dedup_exact", "dedup_minhash", "dedup_simhash", "corpus_dedup",
    "corpus_dedup_stable", "longest_repeat", "exactsubstr_prune",
    "edit_cluster", "decontam_scrub", "image_dedup", "video_dedup",
    # text / retrieval / pack / mix
    "lang_id", "quality_score", "bm25_search", "hybrid_rrf", "pack_plan",
    "mix_rebalance", "heavy_hitters",
    # vectors: ann / knn / semantic, incl. the two-level quartet + the
    # r13 two-level IVF-PQ serving pair
    "ann_ivf", "ann_ivfpq", "knn_graph", "knn_graph_2level",
    "knn_components_2level", "semantic_neardup_2level",
    "semantic_dedup_2level", "ann_ivfpq_2level", "ann_ivfpq_rerank_2level",
    # layout
    "zorder_skip",
]


def connect(sfdir, memory_limit):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{memory_limit}'")
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    return con


def run_with_budget(con, sql, budget):
    """Run sql -> df on con; interrupt after budget seconds. Returns
    (df, None) or (None, 'timeout'/error-string)."""
    out = {}

    def work():
        try:
            out["df"] = con.sql(sql).df()
        except Exception as e:  # includes InterruptException
            out["err"] = str(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(budget)
    if t.is_alive():
        con.interrupt()
        # Loop-join until the worker actually exits: closing the
        # connection while the daemon thread is still executing on it can
        # crash or wedge the gate mid-run instead of recording a clean
        # FAIL. interrupt() aborts the query promptly in practice; the
        # loop is the safety net. If the worker STILL hasn't exited after
        # the grace window, poison the connection so the caller leaks it
        # rather than closing under a live thread.
        deadline = time.time() + 600
        while t.is_alive() and time.time() < deadline:
            t.join(10)
        if t.is_alive():
            _POISONED.append(con)
        return None, "timeout"
    if "err" in out:
        return None, out["err"]
    return out["df"], None


# connections whose worker thread never exited after interrupt(): never
# close these (leaking one idle connection beats a mid-run native crash).
# STRONG references on purpose: an id()-keyed set would let the poisoned
# connection be collected and its id reused by a fresh connection, which
# safe_close would then wrongly skip — the list pins each object (and so
# its id) for the process lifetime, and membership is by identity.
_POISONED = []


def safe_close(con):
    if not any(p is con for p in _POISONED):
        con.close()


def norm(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)) or (hasattr(v, "ndim") and getattr(v, "ndim") >= 1):
        return str([norm(x) for x in v])
    return v


def compare(name, duck, spark):
    """The check.py comparison verbatim: sorted columns, sorted rows,
    exact values. Returns None if equal, else a failure string."""
    for df in (duck, spark):
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(norm)
    dc, sc = sorted(duck.columns), sorted(spark.columns)
    if dc != sc:
        return f"columns duck={dc} spark={sc}"
    d = duck[dc].sort_values(dc, ignore_index=True)
    s = spark[sc].sort_values(sc, ignore_index=True)
    if len(d) != len(s):
        return f"rows duck={len(d)} spark={len(s)}"
    for c in dc:
        if d[c].dtype != s[c].dtype:
            try:
                s[c] = s[c].astype(d[c].dtype)
            except Exception:
                return f"dtype {c}: {d[c].dtype} vs {s[c].dtype}"
        neq = d[c].astype(str) != s[c].astype(str)
        if neq.any():
            i = neq.idxmax()
            return f"value {c}: {neq.sum()} diffs, e.g. {d[c][i]} vs {s[c][i]}"
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sfdir")
    ap.add_argument("outdir")
    ap.add_argument("--budget", type=float, default=900.0)
    ap.add_argument("--memory-limit", default="24GB")
    ap.add_argument("--only", default=None,
                    help="comma-separated override of the committed subset")
    args = ap.parse_args()

    oracle = json.load(open(os.path.join(args.outdir, "oracle_sql.json")))
    names = args.only.split(",") if args.only else SUBSET
    missing = [n for n in names if n not in oracle]
    if missing:
        print(f"FATAL: subset names not in oracle_sql.json: {missing}")
        sys.exit(2)

    fails = 0
    for name in names:
        spark_dir = os.path.join(args.outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        t0 = time.time()
        con = connect(args.sfdir, args.memory_limit)  # fresh per oracle
        duck, err = run_with_budget(con, oracle[name], args.budget)
        retried = False
        if err == "timeout" or (err is not None and "Out of Memory" in err):
            # the r12 policy, extended: a budget/OOM failure is a RESOURCE
            # failure of the quadratic replay, not a mismatch — retry once
            # on a fresh connection, unbounded time, double memory (the
            # iters=1 IVF-PQ Lloyd CTEs and the double-corpus recursive CC
            # legitimately exceed the per-oracle cap at x27)
            safe_close(con)
            big = f"{2 * int(''.join(filter(str.isdigit, args.memory_limit)))}GB"
            con = connect(args.sfdir, big)
            print(f"...  {name}: {err} under {args.budget:.0f}s/"
                  f"{args.memory_limit} — retrying UNBOUNDED at {big}")
            duck, err = run_with_budget(con, oracle[name], None)
            retried = True
        if err is not None:
            print(f"FAIL {name}: oracle error {err}")
            fails += 1
            safe_close(con)
            continue
        try:
            spark = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark read error {e}")
            fails += 1
            safe_close(con)
            continue
        bad = compare(name, duck, spark)
        dt = time.time() - t0
        tag = " (unbounded retry)" if retried else ""
        if bad:
            print(f"FAIL {name}: {bad} [{dt:.1f}s]{tag}")
            fails += 1
        else:
            print(f"OK   {name} ({len(duck)} rows) [{dt:.1f}s]{tag}")
        safe_close(con)
    print("PARITY OK" if fails == 0 else f"{fails} PARITY FAILURES")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
