"""SparkSession builder with the engine's execution profile.

Mirrors the shape of the reference's conf block
(/root/reference/etl/glue_stream.py:295-301) but replaces its
single-stream sizing (``shuffle.partitions=1``) with AQE: runtime
partition coalescing + skew-join splitting, which is what survives a
1000-executor deployment. Package ships via ``spark-submit --py-files``
(see jobs.py); nothing here depends on local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "lakehouse",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = os.cpu_count() or 8
    builder = (
        SparkSession.builder.appName(app_name)
        # AQE replaces the reference's hardcoded shuffle sizing (:297)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64m",
        )
        # Arrow for every Python-boundary exchange (pandas UDFs / mapInPandas)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # parquet profile lifted from the reference sink (:299-301) with
        # one deliberate change: the reference's snappy suits compressible
        # clickstream text, but PCM audio is high-entropy — snappy costs
        # 3-4x write time for 0% size win (measured: 19.3s vs 4.7s for the
        # same 280 MB). lz4 keeps the cheap-codec behavior for the text
        # columns without taxing the binary payload.
        # lz4_raw, not lz4: same speed class, but the legacy lz4 codec
        # uses Hadoop frame wrapping that Arrow/pyarrow (and most
        # non-JVM engines) cannot decode — the datasource.py read path
        # and any external Arrow consumer need LZ4_RAW pages
        .config("spark.sql.parquet.compression.codec", "lz4_raw")
        .config("spark.sql.parquet.filterPushdown", "true")
        # let the registered Python data source (datasource.py) receive
        # WHERE clauses for manifest-level file pruning
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # audio payloads are ~10-100 KB binary cells; the default
        # 4096-row vectorized-reader batch means ~0.3 GB of column
        # vectors PER reader thread — at 32 threads that alone exceeds
        # any sane heap. 512-row batches keep a reader under ~50 MB
        # while staying fully vectorized. Same logic for Arrow batches
        # crossing into pandas UDFs.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # scheduler: maintenance jobs submit file groups concurrently
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.config("spark.master", master)
        if master.startswith("local") and not (extra_conf or {}).get(
            "spark.driver.memory"
        ):
            # local mode: driver == all executors; the 1g default heap
            # cannot hold N concurrent binary-column readers
            builder = builder.config("spark.driver.memory", "24g")
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or cores)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
