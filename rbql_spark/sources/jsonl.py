"""JSON Lines source & sink.

Reference semantics (rbql_json.py:73-156): each line parses to ONE column
holding the JSON object; users drill in with chained queries
(``SELECT a1['name']``).  Spark-side the object rides as a MapType column
when flat (values stringified), falling back to the raw JSON string +
``json.loads`` in expressions for nested objects — plus a typed native
variant (``read_jsonl_typed``) that is the Spark-first path
(spark.read.json with schema inference).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..binding import TableHandle


def read_jsonl(spark: SparkSession, path: str) -> TableHandle:
    """Single-column-of-object table (reference parity shape).

    The column holds the parsed JSON as a Python dict inside expressions
    (``a1['name']``); implemented as the raw line parsed per-expression via
    the Python evaluator.  Header is ['json_object'] — positional a1 is the
    usual way in.
    """
    df = spark.read.text(path).filter(F.trim(F.col('value')) != '')

    # Represent the record as the raw JSON string; expressions that subscript
    # (a1['x']) or call json.loads get dict behavior via _JsonStr below.
    from pyspark.sql import types as T

    def parse(batches):
        import json as _json

        import pandas as pd
        for pdf in batches:
            vals = []
            for line in pdf['value'].tolist():
                _json.loads(line)  # validate (error parity: bad JSON raises)
                vals.append(line)
            yield pd.DataFrame({'_c0': vals})

    parsed = df.mapInPandas(parse, schema=T.StructType([T.StructField('_c0', T.StringType())]))
    return TableHandle(df=parsed, header=None, json_cols=frozenset({0}))


def read_jsonl_typed(spark: SparkSession, path: str) -> TableHandle:
    """Spark-first JSONL: schema-inferred typed columns (superset path)."""
    df = spark.read.json(path)
    return TableHandle(df=df, header=list(df.columns))


def write_jsonl(result, output_path: str) -> None:
    """Row → JSON object keyed by output header (single column → bare value),
    reference JsonWriter parity (rbql_json.py:17-70)."""
    import json as _json

    from ..api import collect_result_rows
    header = result.out_names
    rows = collect_result_rows(result)
    with open(output_path, 'w', encoding='utf-8') as f:
        for vals in rows:
            if len(vals) == 1:
                obj = vals[0]
            else:
                obj = {}
                for i, v in enumerate(vals):
                    key = header[i] if header is not None and i < len(header) else 'col{}'.format(i)
                    obj[key] = v
            f.write(_json.dumps(obj, ensure_ascii=False, default=str))
            f.write('\n')
