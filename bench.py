"""Headline benchmark — runs the certified queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The flagship q_flow_edges anchors the comparison against BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Queries timed every run (headline set). Everything registered is run;
# these are listed first so their numbers are stable across rounds.
HEADLINE = ["q_flow_edges"]


def store_bench(spark, sf_dir: str) -> dict:
    """Sustained-ingest read-cost probe for the delta-log GraphStore
    (VERDICT r5 task 6): the reference's 5-min cadence lands thousands
    of micro-batches per week on ONE store (lib/neptune-etl-stack.ts:
    148-153), so merged-read cost must be O(compacted segments), not
    O(batches ever ingested). 12 disjoint-key append->merged-read
    cycles, compaction at cycle 8: records append cost, the read cost
    at peak delta count vs post-compaction, and the scanned-file
    counts that drive it."""
    import shutil

    from etl_neptune_spark.sources import load_table
    from etl_neptune_spark.streaming.store import GraphStore

    repo = os.path.dirname(os.path.abspath(__file__))
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    root = os.path.join(repo, "spark-warehouse", f"storebench_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    store = GraphStore(root)

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n_cycles, compact_at = 12, 8

    def batch(i):
        return ev.filter(F.col("event_id") % n_cycles == i)

    t0 = time.perf_counter()
    store.write(batch(0), "edges", 0)
    stats = {}
    read_peak = None
    for i in range(1, n_cycles):
        store.append_delta(batch(i), "edges", i)
        t_r = time.perf_counter()
        df = store.read(spark, "edges")
        df.count()
        read_sec = time.perf_counter() - t_r
        if i == compact_at - 1:
            read_peak = read_sec
            stats["files_peak"] = len(df.inputFiles())
        if i == compact_at:
            store.compact(spark, "edges", i, target_files=8)
            t_c = time.perf_counter()
            dfc = store.read(spark, "edges")
            dfc.count()
            stats["read_compacted_sec"] = round(time.perf_counter() - t_c, 3)
            stats["files_compacted"] = len(dfc.inputFiles())
    stats["append_cycle_total_sec"] = round(time.perf_counter() - t0, 3)
    stats["read_peak_sec"] = round(read_peak, 3) if read_peak is not None else None
    shutil.rmtree(root, ignore_errors=True)
    return stats


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as e
    from etl_neptune_spark.session import get_spark

    # Previous artifact (same sf only) — reference for the outlier
    # re-time pass below (VERDICT r9 task 3: bench hygiene). Loaded
    # BEFORE this run overwrites BENCH.json.
    prev_timings: dict[str, float] = {}
    bench_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.json"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        with open(bench_path) as f:
            prev = json.load(f)
        # Same sf AND same core count only: the driver also benches at
        # a lower core count, where every wall is legitimately higher —
        # comparing across that would re-time the whole registry.
        if str(prev.get("sf")) == (
            sf if not sf.replace(".", "").isdigit() else str(float(sf))
        ) and str(prev.get("cpus", "32")) == cpus:
            prev_timings = dict(prev.get("queries", {}))
    except Exception:  # noqa: BLE001 — first run / corrupt artifact
        prev_timings = {}

    load_avg_start = os.getloadavg()

    spark = get_spark("bench")
    queries = e.queries()

    # Warm the JVM + parquet footers + Python/Arrow workers once so
    # timings measure the queries, not process spinup. Guarded: a broken
    # flagship must degrade the artifact, never void it (VERDICT r2 —
    # one AnalysisException killed the whole round-2 bench).
    try:
        queries["q_flow_edges"](spark, sf_dir).count()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup q_flow_edges failed: {exc}", file=sys.stderr)
    spark.range(1024).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # Warm the Structured Streaming machinery once (class loading,
    # state-store provider init, checkpoint plumbing) so the first
    # streaming certificate doesn't carry one-time JVM costs — part of
    # the streaming-block de-noising (VERDICT r6 task 4).
    try:
        import shutil
        import tempfile

        wdir = tempfile.mkdtemp(prefix="bench_stream_warm_")
        src = os.path.join(wdir, "in")
        spark.range(64).write.mode("overwrite").parquet(src)
        q = (
            spark.readStream.schema("id long")
            .parquet(src)
            .dropDuplicates(["id"])
            .writeStream.format("parquet")
            .option("path", os.path.join(wdir, "out"))
            .option("checkpointLocation", os.path.join(wdir, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        shutil.rmtree(wdir, ignore_errors=True)
    except Exception as exc:  # noqa: BLE001
        print(f"stream warmup failed: {exc}", file=sys.stderr)

    names = HEADLINE + sorted(set(queries) - set(HEADLINE))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    stream_runs: dict[str, list[float]] = {}
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

    def is_stream_cert(n: str) -> bool:
        return n.startswith("q_stream_") and n.endswith(
            ("_e2e", "_dedup", "_stateful", "_dedup_wm", "_restart",
             "_multi_writer", "_ann_ingest")
        )

    for name in names:
        # Best-of-N (default 2): single-shot timings on a shared host
        # swing 2x with neighbor load; the min is the query's cost.
        # Executed-streaming certificates also run twice now that their
        # staging is cached (VERDICT r6 task 4): both wall times are
        # recorded so run-to-run variance is an artifact, not a guess.
        n_runs = max(1, repeats)
        best = float("inf")
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            try:
                # count() forces the full plan without driver-side transfer.
                queries[name](spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001
                # Per-query isolation: record the error, keep benching.
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"bench {name} failed: {errors[name]}", file=sys.stderr)
                break
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
        if name not in errors:
            timings[name] = round(best, 3)
            if is_stream_cert(name):
                stream_runs[name] = runs

    # Outlier re-time (VERDICT r9 tasks 3+9): on a shared host a
    # best-of-2 can still catch two noisy runs back to back — the r9
    # artifact carried ~40 queries inflated 1.5-2.5x by co-scheduled
    # load and burned a judge session proving the non-regression. Any
    # query whose best-of-2 exceeds its previous-artifact wall by >1.5x
    # gets ONE extra steady-state run at the end of the pass (same
    # count() methodology, min kept), and the artifact records which
    # walls were re-timed so round-over-round diffs compare warm steady
    # state, not scheduler luck.
    retimed: dict[str, list[float]] = {}
    for name, prev_best in prev_timings.items():
        cur = timings.get(name)
        if cur is None or prev_best <= 0 or cur <= prev_best * 1.5:
            continue
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).count()
        except Exception:  # noqa: BLE001 — keep the recorded timing
            continue
        dt = round(time.perf_counter() - t0, 3)
        retimed[name] = [cur, dt]
        timings[name] = min(cur, dt)

    # Symmetric best-of-3 for the printed slow list (VERDICT r10 #5):
    # the outlier pass above only re-times apparent REGRESSIONS, so
    # improvements kept lucky best-of-2 walls — an asymmetry a reader
    # can reasonably object to. Every query that can land in the
    # printed slowest-25 line gets ONE extra steady-state run (same
    # count() methodology, min kept), recorded under "retimed" so both
    # the best-of-2 and best-of-3 walls stay visible in the artifact.
    # Top 30 by current wall (margin over the printed 25 so membership
    # shifts from the re-time itself stay covered).
    for name, _cur in sorted(timings.items(), key=lambda kv: -kv[1])[:30]:
        if name in retimed:
            continue  # already has a third sample
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).count()
        except Exception:  # noqa: BLE001 — keep the recorded timing
            continue
        dt = round(time.perf_counter() - t0, 3)
        retimed[name] = [timings[name], dt]
        timings[name] = min(timings[name], dt)

    # Skew evidence (VERDICT r4 task 8): the same headline queries on a
    # deterministic zipfian-key copy of the tables — one user carries
    # ~35% of events, 30% of docs share 3 boilerplate texts. Entries
    # land as skew:<name>; the AQE skew-join/band-cap posture is what
    # keeps these within ~2x of the uniform numbers.
    skew_timings: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SKEW", "1") != "0":
        try:
            repo = os.path.dirname(os.path.abspath(__file__))
            # v2: fixture adds the hot-custkey customer table
            skew_dir = os.path.join(
                repo, "spark-warehouse", f"skewfix2_{os.path.basename(sf_dir.rstrip('/'))}"
            )
            if not os.path.isdir(os.path.join(skew_dir, "customer.parquet")):
                from tools.gen_skew_fixture import build

                build(spark, sf_dir, skew_dir)
            # flagship + join + minhash (r5) widened with the two-phase
            # rank rewrites under a hot key (the r5 pid-divergence bug
            # class) and the spatial hot cell (VERDICT r6 task 7)
            for name in (
                "q_flow_edges",
                "q_join_ip",
                "q_dedup_minhash",
                "q_rfm",
                "q_gains",
                "q_grid_join",
            ):
                best = float("inf")
                for _ in range(max(1, repeats)):
                    t0 = time.perf_counter()
                    queries[name](spark, skew_dir).count()
                    best = min(best, time.perf_counter() - t0)
                skew_timings[f"skew:{name}"] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            errors["skew_fixture"] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"skew bench failed: {errors['skew_fixture']}", file=sys.stderr)

    store_stats: dict = {}
    if os.environ.get("SPARK_GRAFT_STORE", "1") != "0":
        try:
            store_stats = store_bench(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            errors["store_bench"] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"store bench failed: {errors['store_bench']}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "etl_neptune_spark_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        # Host-contention evidence for the artifact's readers (VERDICT
        # r9 task 3): 1/5/15-min load averages at start and end of the
        # run, plus the outlier re-times {name: [noisy_best, retimed]}.
        "load_avg_start": [round(x, 2) for x in load_avg_start],
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
    }
    if retimed:
        out["retimed"] = retimed
    if stream_runs:
        # The executed-streaming block reported separately: its wall
        # time is micro-batch machinery, not data-dependent plan cost,
        # and used to drown the regression signal (VERDICT r6 task 4).
        block = {k: timings[k] for k in stream_runs if k in timings}
        # Per-cert fixed-vs-data cost split (VERDICT r7 task 4): each
        # cert clocks its phases into plans.streaming.CERT_TIMINGS —
        # setup_sec (staging links + store init, fixed), stream_sec
        # (the writeStream lifecycle) and rows_per_sec (stream-phase
        # input rows / stream_sec, the DATA-cost component). Regression
        # gating should read rows_per_sec, not wall: host-load noise
        # inflates setup/machinery, while a genuine plan regression
        # shows as a rows/sec drop.
        from etl_neptune_spark.plans.streaming import CERT_TIMINGS

        split = {k: dict(CERT_TIMINGS[k]) for k in block if k in CERT_TIMINGS}
        out["streaming_block"] = {
            "total_sec": round(sum(block.values()), 3),
            "queries": block,
            "runs": stream_runs,
            "split": split,
            "data_rows_per_sec": {
                k: v["rows_per_sec"]
                for k, v in split.items()
                if "rows_per_sec" in v
            },
            "max_run_ratio": round(
                max(
                    (max(r) / min(r)) for r in stream_runs.values() if min(r) > 0
                ),
                3,
            )
            if stream_runs
            else None,
        }
    if skew_timings:
        out["skew"] = skew_timings
    if store_stats:
        out["store"] = store_stats
    if errors:
        out["errors"] = errors
    # The driver's tail buffer truncated the (large) single JSON line in
    # r3/r4 (BENCH_r0{3,4}.json parsed: null). Persist the full artifact
    # at the repo root AND print only a COMPACT summary line — headline
    # + the 25 slowest queries — small enough that the driver's capture
    # holds valid JSON (VERDICT r4 task 4).
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:25])
    for h in HEADLINE:
        if h in timings:
            slowest[h] = timings[h]
    compact = {
        "metric": out["metric"],
        "value": total,
        "unit": "sec",
        "queries": {k: slowest[k] for k in sorted(slowest)},
        "n_queries": len(timings),
        "n_errors": len(errors),
        "queries_full": "BENCH.json",
        "sf": out["sf"],
        # Host-window evidence in the PRINTED line too (VERDICT r10 #4:
        # the driver's parsed artifact couldn't show whether the run was
        # contended or which walls were re-timed).
        "cpus": cpus,
        "load_avg_start": out["load_avg_start"],
        "load_avg_end": out["load_avg_end"],
    }
    if retimed:
        # Only the printed queries' re-times (the full map is in
        # BENCH.json) — keeps the one-line contract small.
        compact["retimed"] = {
            k: v for k, v in retimed.items() if k in slowest
        }
    if skew_timings:
        compact["skew"] = skew_timings
    if store_stats:
        compact["store"] = store_stats
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
