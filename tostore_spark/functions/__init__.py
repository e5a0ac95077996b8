from tostore_spark.functions.colutil import let_array, let_scalar  # noqa: F401
