"""sqlite entry point (reference rbql_sqlite.py parity).

The reference iterates a cursor single-threaded; the Spark-first analog
bridges the table into a DataFrame (driver-side read — sqlite is a
single-file embedded DB, inherently non-distributed; for bulk relational
sources use spark.read.jdbc).  Native column types pass through
(rbql_sqlite.py:36-41), header from cursor.description.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import SparkSession

from ..binding import TableHandle
from ..errors import RbqlIOHandlingError
from ..registry import TableRegistry


def _read_sqlite_table(spark: SparkSession, conn, table_name: str) -> TableHandle | None:
    cur = conn.cursor()
    try:
        # identifier quoting; sqlite table names can't be parameterized
        cur.execute('SELECT * FROM "{}"'.format(table_name.replace('"', '""')))
    except sqlite3.OperationalError:
        return None
    header = [d[0] for d in cur.description]
    rows = cur.fetchall()
    from ..api import _rows_to_handle
    handle = _rows_to_handle(spark, [list(r) for r in rows], column_names=header)
    return handle


class SqliteRegistry(TableRegistry):
    def __init__(self, conn):
        self.conn = conn

    def get_table(self, spark, table_id):
        return _read_sqlite_table(spark, self.conn, table_id)

    def missing_join_table_error(self, table_id):
        return RbqlIOHandlingError('Unable to find join table "{}"'.format(table_id))


def query_sqlite(spark: SparkSession, query: str, db_path: str, table_name: str,
                 user_init_code: str = ''):
    """Run an RBQL query over a sqlite table; other tables in the same DB are
    joinable by name.  Returns (rows, header)."""
    conn = sqlite3.connect(db_path)
    try:
        handle = _read_sqlite_table(spark, conn, table_name)
        if handle is None:
            raise RbqlIOHandlingError('Unable to find input table: "{}"'.format(table_name))
        from ..api import collect_result_rows, query_dataframe
        result = query_dataframe(spark, query, handle,
                                 registry=SqliteRegistry(conn),
                                 user_init_code=user_init_code)
        return collect_result_rows(result), result.out_names
    finally:
        conn.close()
