"""mssql_dataframe_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of jwcook23/mssql_dataframe.

The reference is a client-side pandas<->SQL-Server data-engineering
library (create / modify / read / insert / update / merge over ODBC).
This package re-expresses that surface Spark-first — DataFrame/SQL
plans optimized by Catalyst, a copy-on-write Parquet table store for
the mutable-table semantics — and extends it with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal plumbing, streaming).
"""

from .session import SparkEngine, connect  # noqa: F401
from . import errors  # noqa: F401

__version__ = "0.1.0"
