#!/usr/bin/env python
"""Optimization-round profiling harness (guide §1).

Usage:
    python profile_query.py <query>[,<query>...] [--sf-dir D] [--runs N]
        [--plans-to DIR] [--tag before|after]

For each named query: runs it --runs times via the noop sink (same
timed action as bench.py), prints per-run wall seconds, and writes
`.explain("formatted")` to <plans-to>/<query>_<tag>.txt.  Plans are
captured from the DataFrame the query function returns — the same
object bench.py times.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mpi_word_count_spark import operators, registry  # noqa: E402
from mpi_word_count_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-to", default="plans/r10")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    names = args.queries.split(",")
    spark = get_spark(app_name="profile")
    qs = registry.queries()
    os.makedirs(args.plans_to, exist_ok=True)

    # absorb one-time JVM init like bench.py does
    from mpi_word_count_spark.operators.wordcount import word_count_df

    tiny = spark.createDataFrame([("warm up",)], "text string")
    word_count_df(tiny).write.format("noop").mode("overwrite").save()
    spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        times = []
        for i in range(args.runs):
            t0 = time.monotonic()
            df = qs[name](spark, args.sf_dir)
            t_build = time.monotonic() - t0
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.monotonic() - t0
            times.append(elapsed)
            print(
                f"{name} run{i}: {elapsed:7.3f}s (build {t_build:6.3f}s)",
                flush=True,
            )
            if i == 0 and not args.no_plan:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                path = os.path.join(
                    args.plans_to, f"{name}_{args.tag}.txt"
                )
                with open(path, "w") as f:
                    f.write(buf.getvalue())
            operators.release_caches()
        print(f"{name} min={min(times):.3f}s runs={[round(t,3) for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
