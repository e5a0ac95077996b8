from tostore_spark.plans.batch_export import query_each_batch  # noqa: F401
from tostore_spark.plans.schema_builder import SchemaBuilder  # noqa: F401
