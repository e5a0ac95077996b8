"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings are the
ones we would ship to a 1000-executor cluster (AQE on, skew-join handling,
reasonable shuffle partitioning, Arrow for the few pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tostore-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime re-planning, partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Pin the session timezone: TIMESTAMP_NTZ -> TIMESTAMP casts
        # (functions/colutil.epoch_us, watermark normalization) must use
        # a FIXED offset — a DST-shifting host zone would distort gap
        # arithmetic by an hour across transitions.
        .config("spark.sql.session.timeZone", "UTC")
        # Pin the SQL string-literal dialect: the single-parse SQL twins
        # (llmops.text._stats_sql / norm_sql, the minhash index build)
        # embed backslash escapes ('\\s') that only mean the same thing
        # as the Column regexes under the default escaped-literal parser.
        # A session inheriting legacy escapedStringLiterals=true would
        # silently fork the SQL twins from the Column definition of
        # record (fingerprints/minhash diverge) — pin it here so every
        # engine session parses the twins identically.
        .config("spark.sql.parser.escapedStringLiterals", "false")
        # Write TIMESTAMP columns as INT64 microseconds, not Spark's
        # legacy INT96: INT96 carries NO parquet footer statistics (so
        # timestamp columns would silently fall out of every skipping
        # tier) and is forbidden in Iceberg data files (the spec pins
        # timestamps to int64 micros).  Read-side both forms decode.
        .config("spark.sql.parquet.outputTimestampType",
                "TIMESTAMP_MICROS")
        # One shuffle partition per core locally; on a cluster this would be
        # sized to ~128MB of shuffle data per partition (AQE coalesces down).
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
