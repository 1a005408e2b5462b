"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Each query is forced with a noop sink (full materialization, no
collect-to-driver bottleneck, no count() short-circuit).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from big_data_stock_price_forecast_spark.plans.registry import all_queries
    from big_data_stock_price_forecast_spark.session import get_spark

    spark = get_spark(app_name="bdspf-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM (whole-stage codegen compilation, parquet reader
    # classes, shuffle machinery) so per-query timings measure the
    # engine, not one-time class loading billed to whichever query
    # happens to run first
    from pyspark.sql import functions as F

    warm = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    warm.groupBy("user_id").agg(F.count(F.lit(1))).write.format(
        "noop"
    ).mode("overwrite").save()
    # window-function exec path (sort-based window operators) — the
    # first registry queries are window-heavy event analytics and would
    # otherwise be billed for this one-time machinery
    from pyspark.sql import Window

    warm.select(
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("event_id"))
        .alias("rn")
    ).write.format("noop").mode("overwrite").save()
    # Python-worker pool + Arrow serialization (mapInPandas queries):
    # worker fork + pandas import costs ~1-2s once per session
    warm.limit(64).mapInPandas(
        lambda it: it, schema=warm.schema
    ).write.format("noop").mode("overwrite").save()

    # streaming machinery warmup (micro-batch executor, state store,
    # memory sink classes) — a one-row stream through a memory sink, so
    # the stream_* query timings measure the incremental plans, not
    # one-time class loading
    import tempfile

    from big_data_stock_price_forecast_spark.streaming.ops import (
        run_available_now,
    )

    with tempfile.TemporaryDirectory(prefix="bdspf-warm-") as td:
        warm.limit(1).write.mode("overwrite").parquet(td)
        sdf = spark.readStream.schema(
            spark.read.parquet(td).schema
        ).parquet(td)
        run_available_now(sdf.groupBy("user_id").count(), "complete")
        # the stateful/watermark machinery (applyInPandasWithState
        # Python workers, state store providers, event-time tracking)
        # loads lazily on first use and costs several seconds — warm it
        # too, or the first stream_* query gets billed for it
        from big_data_stock_price_forecast_spark.streaming.ops import (
            ema_state_stream,
        )

        state_in = (
            spark.readStream.schema(spark.read.parquet(td).schema)
            .parquet(td)
            .select(
                F.col("user_id").alias("symbol"),
                F.col("ts").cast("timestamp").alias("datetime"),
                F.col("value").alias("close"),
                F.col("event_id"),
            )
        )
        run_available_now(ema_state_stream(state_in), "append")

    def _jvm_stats(spark) -> dict:
        # block-manager / GC forensics for the headline runs (r14
        # verdict item 1: the driver-box fullscale swung 87->115s on
        # unchanged plans; these counters say whether a slow run was
        # the PLAN or accumulated session residue / GC pressure)
        out: dict = {}
        try:
            jvm = spark.sparkContext._jvm
            mf = jvm.java.lang.management.ManagementFactory
            heap = mf.getMemoryMXBean().getHeapMemoryUsage()
            out["heap_used_mb"] = int(heap.getUsed() / (1024 * 1024))
            gc_ms, gc_n = 0, 0
            beans = mf.getGarbageCollectorMXBeans()
            for i in range(beans.size()):
                b = beans.get(i)
                gc_ms += int(b.getCollectionTime())
                gc_n += int(b.getCollectionCount())
            out["gc_ms"] = gc_ms
            out["gc_count"] = gc_n
            out["persistent_rdds"] = int(
                spark.sparkContext._jsc.getPersistentRDDs().size()
            )
        except Exception:  # noqa: BLE001 — forensics must never fail a run
            pass
        return out

    def _run_fullscale(spark, sf_dir, n_runs, position):
        """Timed fullscale runs with before/after JVM stats."""
        from big_data_stock_price_forecast_spark.plans.flagship import (
            FlagshipParams,
            flagship_summary,
        )

        pfs = FlagshipParams(
            resample_every="10 minutes",
            step_seconds=600,
            L=256,
            pred_window=192,
            k=5,
            ensemble=2,
            stride=64,
        )
        runs, stats = [], []
        for i in range(n_runs):
            pre = _jvm_stats(spark)
            t0 = time.perf_counter()
            flagship_summary(spark, sf_dir, pfs).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            post = _jvm_stats(spark)
            runs.append(round(dt, 3))
            stats.append(
                {
                    "position": position,
                    "secs": round(dt, 3),
                    "heap_used_mb_pre": pre.get("heap_used_mb"),
                    "heap_used_mb_post": post.get("heap_used_mb"),
                    "gc_ms_delta": (
                        post.get("gc_ms", 0) - pre.get("gc_ms", 0)
                    ),
                    "gc_count_delta": (
                        post.get("gc_count", 0) - pre.get("gc_count", 0)
                    ),
                    "persistent_rdds_pre": pre.get("persistent_rdds"),
                }
            )
            print(
                f"# flagship_fullscale [{position}] run"
                f" {i + 1}/{n_runs}: {dt:.3f}s"
                f" (gc {stats[-1]['gc_ms_delta']}ms,"
                f" heap {pre.get('heap_used_mb')}->"
                f"{post.get('heap_used_mb')}MB)",
                file=sys.stderr,
            )
            spark.catalog.clearCache()
        return runs, stats

    def _drop_leaked_blocks(spark) -> None:
        # localCheckpoint(eager) blocks (metric sweep's val frame, the
        # probe curve's anchor/centroid frames, ...) stay pinned in the
        # block manager until the lazy ContextCleaner notices the
        # Python-side DataFrame died; over a 348-query session that
        # residue is what the END of the bench measures (r14: the
        # fullscale runs read 182-215s in-bench vs 71-110s isolated on
        # the same code). Explicit unpersist after every query keeps
        # late positions measuring their plan, not accumulated GC
        # pressure.
        try:
            for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs()
                             .values()):
                jrdd.unpersist(False)
        except Exception:  # noqa: BLE001 — hygiene must never fail a run
            pass

    # position-A timing (r14 verdict item 1): the fullscale headline
    # FIRST — right after warmup, before 350 queries of session
    # residue — so a slow end-position min is attributable to the
    # session, not the plan. Recorded separately; the committed
    # headline min spans BOTH positions.
    extra_timings: dict[str, object] = {}
    fullscale_stats: list[dict] = []
    first_runs: list[float] = []
    try:
        n_first = int(
            os.environ.get("SPARK_GRAFT_FULLSCALE_FIRST_RUNS", "1")
        )
        if n_first > 0:
            first_runs, st = _run_fullscale(
                spark, sf_dir, n_first, "first"
            )
            fullscale_stats.extend(st)
            spark.catalog.clearCache()
            _drop_leaked_blocks(spark)
    except Exception as e:  # noqa: BLE001
        print(
            f"# flagship_fullscale[first]: ERROR"
            f" {type(e).__name__}: {str(e)[:300]}",
            file=sys.stderr,
        )

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name, fn in all_queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # lose the whole bench line (round 4 died on the first query
            # and recorded nothing)
            errors[name] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)
        # per-query isolation: several queries persist() intermediates
        # (dedup shingle sets, window frames for the MLlib fit); without
        # this, pinned storage memory accumulates across the run and
        # late-position queries measure GC pressure, not their plan
        spark.catalog.clearCache()
        _drop_leaked_blocks(spark)

    # BENCH-only: the reference's REAL window config (seq_len=256,
    # pred_window=192, k=5, stride=seq_len//4=64 — the notebooks/
    # test.ipynb evaluate(256, 192, ...) call; core/data/dataset.py
    # only defines the stride-1 __getitem__) on a 10-minute grid
    # (~4.3k buckets/symbol at sf0.1, the scale where val splits
    # clear L+P=448 rows), so W1's 256x window-materialization cost
    # is MEASURED per round instead of asserted (r10 verdict item 2).
    # Not in all_queries() and recorded under extra_timings, NOT the
    # per-query timings map, so sum(timings.values()) stays equal to
    # the headline total (BENCH_r01-r11 comparability). Run 3x —
    # NOTES_r11 measured a 104-197s band on identical code (GC/
    # page-cache noise on this shared box) — so the line carries a
    # representative min plus the observed band.

    # min-of-2 for the slow tail (r12 verdict item 6): the box swings
    # 1.5-2x on identical code, so any query over 5s gets a second
    # run and the JSON records min + both runs under extra_timings —
    # cross-round regressions on the heavy lines become attributable
    # to plans, not scheduling. The headline `queries`/`value` stay
    # single-first-run (comparable with BENCH_r01-r12).
    slow = {n: t for n, t in timings.items() if t > 5.0}
    if slow:
        slow_runs: dict[str, object] = {}
        qmap = all_queries()
        for name, t1 in slow.items():
            t0 = time.perf_counter()
            try:
                qmap[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 — keep the first timing
                continue
            t2 = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
            _drop_leaked_blocks(spark)
            slow_runs[name] = {"runs": [t1, t2], "min": min(t1, t2)}
            print(f"# {name} rerun: {t2:.3f}s (min {min(t1, t2):.3f})",
                  file=sys.stderr)
        if slow_runs:
            extra_timings["slow_query_runs"] = slow_runs

    try:
        # a clean block manager + one full GC before the headline
        # timing: the fullscale runs are the bench's scale anchor and
        # must not measure 348 queries of session residue
        _drop_leaked_blocks(spark)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

        n_runs = int(os.environ.get("SPARK_GRAFT_FULLSCALE_RUNS", "3"))
        runs, st = _run_fullscale(spark, sf_dir, n_runs, "end")
        fullscale_stats.extend(st)
        if runs or first_runs:
            # headline min spans BOTH positions; the per-position
            # bands are recorded so a driver-box regression is
            # attributable (first ≈ end ⇒ plan; first ≪ end ⇒
            # session residue; both high vs local ⇒ box load)
            extra_timings["flagship_fullscale"] = min(
                runs + first_runs
            )
            extra_timings["flagship_fullscale_runs"] = runs
            if first_runs:
                extra_timings["flagship_fullscale_first_runs"] = (
                    first_runs
                )
            extra_timings["flagship_fullscale_stats"] = fullscale_stats
    except Exception as e:  # noqa: BLE001
        errors["flagship_fullscale"] = f"{type(e).__name__}: {str(e)[:300]}"

    out = {
        "metric": "total_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    # full record (per-run arrays, JVM heap/GC stats) goes to the file
    # copy; stdout carries only scalars. r14's round-over-round
    # comparison was lost because the `runs` arrays bloated the stdout
    # line past the driver's 2000-char tail capture (VERDICT r15 item
    # 2) — the numbers and methodology are unchanged, only where the
    # diagnostic arrays are written.
    full = dict(out)
    if extra_timings:
        full["extra_timings"] = extra_timings
        compact = {
            k: v
            for k, v in extra_timings.items()
            if isinstance(v, (int, float))
        }
        if compact:
            out["extra_timings"] = compact
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(json.dumps(full) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
