"""Sinks (reference O4-O7, SURVEY.md §2.1).

The reference writes one CSV `csv_results.csv` with header
`Word,Count` (write_csv, word_count_mpi.c:132-142), prints cells as
`Key: %s -- Value: %ld` (cell.c:37-39), and appends wall-clock
seconds to timing.log (word_count_mpi.c:434-437).
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, single_file: bool = True) -> str:
    """CSV sink with header (O4).

    `single_file=True` reproduces the reference's one-file output by
    coalescing to a single task — correct for parity runs, wrong at
    100 TB; pass False to keep one file per partition (the scalable
    default for any real corpus).
    """
    tmp = path + ".spark-tmp" if single_file else path
    writer = df.coalesce(1) if single_file else df
    writer.write.mode("overwrite").option("header", True).csv(tmp)
    if single_file:
        part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
        shutil.move(part, path)
        shutil.rmtree(tmp)
    return path


def write_word_count_csv(df: DataFrame, path: str = "csv_results.csv") -> str:
    """Byte-parity CSV for the flagship query: header `Word,Count`
    (word_count_mpi.c:137)."""
    renamed = df.withColumnRenamed("word", "Word").withColumnRenamed("count", "Count")
    return write_csv(renamed, path, single_file=True)


def show_console(df: DataFrame, limit: int = 0) -> list[str]:
    """Console sink parity with the sequential oracle: one line per
    record, `Key: <word> -- Value: <count>` (cell.c:37-39)."""
    rows = df.collect() if limit <= 0 else df.take(limit)
    lines = [f"Key: {r[0]} -- Value: {r[1]}" for r in rows]
    print("\n".join(lines))
    return lines


def observed_write(
    df: DataFrame,
    metrics: dict[str, "object"],
    path: str | None = None,
) -> dict[str, object]:
    """Metrics sink, Spark-native form (O6 modernized): attach an
    Observation to the plan so row counts / sums / mins are collected
    DURING the one execution — no second pass over the data, which is
    the only affordable way to audit a 100 TB write. The reference's
    equivalent is the wall-clock line appended to timing.log
    (word_count_mpi.c:434-437); observe() generalizes it to arbitrary
    aggregate metrics riding the same job.

    `metrics` maps name -> aggregate Column (e.g. F.count, F.sum).
    Executes via parquet write when `path` is given, else a noop-format
    write; returns the observed metric values.
    """
    from pyspark.sql import Observation

    obs = Observation()
    named = [col.alias(name) for name, col in metrics.items()]
    watched = df.observe(obs, *named)
    if path is None:
        watched.write.format("noop").mode("overwrite").save()
    else:
        watched.write.mode("overwrite").parquet(path)
    return obs.get


@contextmanager
def timing_log(path: str = "timing.log", label: str = "query"):
    """Metrics sink (O6): append elapsed wall seconds, like the
    reference's MPI_Wtime → timing.log."""
    start = time.monotonic()
    yield
    elapsed = time.monotonic() - start
    with open(path, "a") as fh:
        fh.write(f"{label}: {elapsed:.6f} s\n")
