"""pandas entry point (reference rbql_pandas.py parity).

``query_pandas_dataframe(spark, query, df)`` — columns addressable by name
(``a.name``) when the DataFrame has real column labels; a default RangeIndex
column set means headerless (reference DataframeIterator, rbql_pandas.py:11-33).
Returns a new pandas DataFrame (DataframeWriter.finish parity).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..binding import TableHandle


def _py_cell(v):
    """numpy scalar → plain Python value (itertuples yields np.int64 /
    np.float64); NaN stays a real float nan — the reference's
    DataframeIterator hands nan cells to expressions as nan, never None
    (rbql_pandas.py:20-27 itertuples)."""
    if v is None or isinstance(v, (str, bytes)):
        return v
    if hasattr(v, 'item'):
        try:
            return v.item()
        except (ValueError, AttributeError):
            return v
    return v


def _pdf_to_handle(spark: SparkSession, pdf) -> TableHandle:
    import pandas as pd
    headerless = isinstance(pdf.columns, pd.RangeIndex)
    names = ['_c{}'.format(i) for i in range(len(pdf.columns))] if headerless \
        else [str(c) for c in pdf.columns]
    # Two shapes need the row-wise 2D-array ingest instead of the direct
    # arrow path: (1) an object column mixing numbers and strings (the
    # tagged-cell representation, mixedcell.py); (2) a float column with
    # NaN cells — arrow ingestion would turn NaN into null, but the
    # reference's itertuples yields real nan floats (str(nan) renders
    # 'nan', not 'None').  Homogeneous NaN-free frames keep the direct
    # path and today's plans.
    route_rows = any(getattr(pdf[c].dtype, 'kind', '') == 'f'
                     and pdf[c].isna().any() for c in pdf.columns)
    if not route_rows and any(pdf[c].dtype == object for c in pdf.columns):
        from ..mixedcell import is_mixed_type
        from ..pyeval import _infer_spark_type
        for c in pdf.columns:
            if pdf[c].dtype != object:
                continue
            vals = [v for v in pdf[c].tolist()]
            if is_mixed_type(_infer_spark_type(vals)):
                route_rows = True
                break
    if route_rows:
        from ..api import _rows_to_handle
        rows = [[_py_cell(v) for v in row]
                for row in pdf.itertuples(index=False, name=None)]
        return _rows_to_handle(spark, rows, None if headerless else names)
    sdf = spark.createDataFrame(pdf.rename(columns=dict(zip(pdf.columns, names))))
    return TableHandle(df=sdf, header=None if headerless else names)


def query_pandas_dataframe(spark: SparkSession, query: str, pdf,
                           join_pdf=None, user_init_code: str = ''):
    """Run an RBQL query over a pandas DataFrame; returns a pandas DataFrame."""
    import pandas as pd

    from ..api import collect_result_rows, query_dataframe
    handle = _pdf_to_handle(spark, pdf)
    join_handle = _pdf_to_handle(spark, join_pdf) if join_pdf is not None else None
    result = query_dataframe(spark, query, handle, join_table=join_handle,
                             user_init_code=user_init_code)
    rows = collect_result_rows(result)
    columns = result.out_names
    if columns is None:
        width = max((len(r) for r in rows), default=0)
        return pd.DataFrame(rows, columns=list(range(width)) if width else None)
    return pd.DataFrame(rows, columns=columns)
