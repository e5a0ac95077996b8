from tostore_spark.streaming.reactive import StreamQueryBuilder, Watcher  # noqa: F401
