"""Line-oriented text-directory source.

Mirrors the reference's input contract: a job consumes every file in
``input_directory`` sorted by name, one record per line (reference:
mapreduce/manager/__main__.py:93-95, mapreduce/worker/__main__.py:133).
Spark's text source already splits by line; we sort the file list for
deterministic task->file assignment parity and optionally expose the
provenance filename.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_dir(
    spark: SparkSession,
    input_dir: str,
    num_partitions: int | None = None,
    with_filename: bool = False,
) -> DataFrame:
    """Read every file in ``input_dir`` (sorted by name) as one line-per-row
    DataFrame[value: string].

    ``num_partitions`` emulates the reference's ``num_mappers`` knob
    (file i -> map task i % M, reference mapreduce/manager/__main__.py:99-107):
    we don't reproduce the exact file->task layout — Spark plans splits by
    size, which is strictly better at scale — but we honor the requested
    parallelism with an explicit repartition when asked.
    """
    paths = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if os.path.isfile(os.path.join(input_dir, f))
    )
    if not paths:
        raise FileNotFoundError(f"no input files in {input_dir}")
    df = spark.read.text(paths)
    if with_filename:
        df = df.withColumn("filename", F.input_file_name())
    if num_partitions:
        df = df.repartition(num_partitions)
    return df
