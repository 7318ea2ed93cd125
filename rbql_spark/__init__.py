"""rbql_spark — a PySpark-native analytics engine with the query surface of
mechatroner/RBQL, rebuilt Spark-first (DataFrame / Catalyst), plus
large-scale data-pipeline operators (dedup, similarity search, text
analysis, windows) designed for 100 TB-class inputs.

Public API (analog of the reference entry points, SURVEY §3):

  query_dataframe(spark, query, df, …)     — rbql_pandas.query_dataframe analog
  query_table(spark, query, rows, …)       — rbql_engine.query_table analog
  query_csv(spark, query, input_path, …)   — rbql_csv.query_csv analog
"""

from .api import query_csv, query_dataframe, query_table  # noqa: F401
from .errors import (  # noqa: F401
    RbqlError, RbqlIOHandlingError, RbqlParsingError, RbqlRuntimeError,
    exception_to_error_info,
)

__version__ = '0.1.0'
