"""Profile individual bench queries: isolated wall time + driver-side
cProfile attribution (which operator calls the wall-clock blocks on).

The driver blocks inside py4j on every Spark action, so cumulative
cProfile time on an operator function ≈ the wall-clock its jobs cost —
the fastest way to attribute a multi-commit lifecycle entry's seconds
to its phases without an event-log parse.

Usage: python tools/profile_query.py [--sf SF_DIR] [--runs N]
                                     [--profile] query [query ...]

Prints per-query: min/all wall times over N runs (noop sink, same
methodology as bench.py), Spark job count, and with --profile the top
cumulative-time frames filtered to this repo's code.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from cs186_query_optimization_project_spark import get_spark  # noqa: E402


def main() -> None:
    argv = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    do_profile = False
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i:i + 2]
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i:i + 2]
    if "--profile" in argv:
        do_profile = True
        argv.remove("--profile")
    names = argv
    spark = get_spark(app_name="profile")
    queries = entry_mod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    # warm the session + catalog like bench.py does
    entry_mod.q_scan(spark, sf_dir).count()

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    def job_count() -> int:
        v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else int(v.get())

    for name in names:
        fn = queries[name]
        samples = []
        jobs = None
        prof = None
        build_s = sink_s = None
        for r in range(runs):
            j0 = job_count()
            profiling_run = do_profile and r == runs - 1
            if profiling_run:
                prof = cProfile.Profile()
                prof.enable()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            materialize(df)
            dt = time.perf_counter() - t1
            if profiling_run:
                prof.disable()
            if build_s is None or (t1 - t0) + dt < build_s + sink_s:
                build_s, sink_s = t1 - t0, dt
            samples.append(time.perf_counter() - t0)
            jobs = job_count() - j0
        print(f"== {name}: min {min(samples):.3f}s  "
              f"(build {build_s:.3f} + sink {sink_s:.3f})  "
              f"runs {[round(s, 3) for s in samples]}  jobs/run {jobs}")
        if prof is not None:
            out = io.StringIO()
            st = pstats.Stats(prof, stream=out)
            st.sort_stats("cumulative")
            st.print_stats(r"repo/(cs186|__spark)", 30)
            text = out.getvalue()
            # drop the preamble noise, keep the table
            lines = [ln for ln in text.splitlines() if ln.strip()]
            for ln in lines:
                print(ln)
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
