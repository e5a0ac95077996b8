"""tostore_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tocreator/tostore.

The reference (/root/reference, Dart) is an embedded OLTP/edge multi-model
database.  This package re-expresses its query semantics — chainable query
builder, condition trees, joins, aggregations, keyset pagination, KV
namespace, TTL, vector search — as idiomatic PySpark DataFrame plans, and
adds the LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) the reference lacks, all designed for 100 TB scale:
declarative plans (Catalyst pushdown/pruning), broadcast joins for small
dims, no driver-side row loops in any hot path.
"""

from tostore_spark.engine import ToStoreSpark
from tostore_spark.condition import QueryCondition
from tostore_spark.agg import Agg
from tostore_spark.expr import Expr
from tostore_spark.session import get_spark
from tostore_spark.at_rest import EncryptionConfig

__all__ = ["ToStoreSpark", "QueryCondition", "Agg", "Expr", "get_spark",
           "EncryptionConfig"]
__version__ = "0.1.0"
