"""CSV/TSV source & sink with the reference's dialect matrix.

Split policies (reference rbql_csv.py:318-504, csv_utils.py:4-80 — behavior
reimplemented, not copied):

  simple      plain split on a (possibly multichar) delimiter  → native F.split
  whitespace  runs of spaces                                    → native
  monocolumn  whole line = one field                            → native
  quoted      RFC quotes within one line; defective-quote warning
              → Arrow-batched Python splitter (mapInPandas)
  quoted_rfc  RFC-4180 incl. multiline quoted fields
              → driver-side record assembly (legacy-file path; for bulk data
                use native=True → spark.read.csv(multiLine=True))

Encodings: utf-8 (distributed text scan) and latin-1 (binary-safe,
driver-side decode — legacy path).  BOM stripped with a warning.  Ragged
rows supported: rows are padded to table width, true per-row NF rides along
in __nf_src (engine safe_get parity: missing → None).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..binding import NF_SRC_COL, TableHandle
from ..errors import RbqlIOHandlingError

# RFC quoted field: "((?:[^"]*"")*[^"]*)" with optional outer whitespace
_FIELD_RGX = re.compile(r'"((?:[^"]*"")*[^"]*)"')
_FIELD_RGX_WS = re.compile(r' *"((?:[^"]*"")*[^"]*)" *')


def split_quoted(src: str, dlm: str) -> tuple[list[str], bool]:
    """RFC-style quoted split; returns (fields, defective_quoting_warning)."""
    if '"' not in src:
        return src.split(dlm), False
    allow_ws = dlm != ' '
    rgx = _FIELD_RGX_WS if allow_ws else _FIELD_RGX
    result: list[str] = []
    warning = False
    cidx = 0
    n = len(src)
    while cidx < n:
        m = rgx.match(src, cidx)
        if m is not None and (m.end() == n or src[m.end()] == dlm):
            result.append(m.group(1).replace('""', '"'))
            cidx = m.end() + 1
            continue
        if m is not None:
            warning = True
        uidx = src.find(dlm, cidx)
        if uidx == -1:
            uidx = n
        field = src[cidx:uidx]
        warning = warning or '"' in field
        result.append(field)
        cidx = uidx + 1
    if src and src[-1] == dlm:
        result.append('')
    return result, warning


def split_whitespace(src: str) -> list[str]:
    return re.findall(r'[^ ]+', src)


def _record_split_rfc(content: str, dlm: str, comment_prefix: str | None = None,
                      table_name: str = 'input') -> list[list[str]]:
    """Assemble multiline RFC records (reference get_row_rfc,
    rbql_csv.py:420-439): a line with an odd number of double quotes opens a
    multiline record that closes at the next odd-quote line.  Comment lines
    are filtered at record boundaries only.  Defective quoting is a hard
    error carrying (record, line) ordinals (rbql_csv.py:461-468)."""
    lines = re.split(r'\r\n|\r|\n', content)
    if lines and lines[-1] == '':
        lines.pop()
    records: list[list[str]] = []
    idx, nl, nr = 0, 0, 0
    n = len(lines)
    while idx < n:
        line = lines[idx]
        idx += 1
        nl += 1
        if comment_prefix is not None and line.startswith(comment_prefix):
            continue
        rows = [line]
        if line.count('"') % 2 == 1:
            while idx < n:
                nxt = lines[idx]
                idx += 1
                nl += 1
                rows.append(nxt)
                if nxt.count('"') % 2 == 1:
                    break
        logical = '\n'.join(rows)
        nr += 1
        fields, warning = split_quoted(logical, dlm)
        if warning:
            raise RbqlIOHandlingError(
                'Inconsistent double quote escaping in {} table at record {}, line {}'
                .format(table_name, nr, nl))
        records.append(fields)
    return records


def _strip_bom(text: str) -> tuple[str, bool]:
    if text.startswith('\ufeff'):
        return text[1:], True
    if text.startswith('\xef\xbb\xbf'):
        # UTF-8 BOM bytes seen through latin-1 decoding (reference
        # remove_utf8_bom handles both, rbql_csv.py:47-56)
        return text[3:], True
    return text, False


def read_csv(spark: SparkSession, path: str, delim: str = ',',
             policy: str = 'quoted', encoding: str = 'utf-8',
             with_headers: bool = False, comment_prefix: str | None = None,
             strip_whitespaces: bool = False,
             native: bool = False) -> TableHandle:
    if policy == 'monocolumn' and delim != '':
        pass  # monocolumn ignores the delimiter
    if delim == '"' and policy in ('quoted', 'quoted_rfc'):
        raise RbqlIOHandlingError('Double quote delimiter is incompatible with "quoted" policy')
    if encoding not in ('utf-8', 'latin-1'):
        raise RbqlIOHandlingError('Unsupported encoding: ' + encoding)

    if native:
        return _read_csv_native(spark, path, delim, policy, with_headers, encoding, comment_prefix)

    if encoding == 'latin-1' or policy == 'quoted_rfc':
        return _read_csv_driver_side(spark, path, delim, policy, encoding,
                                     with_headers, comment_prefix, strip_whitespaces)
    return _read_csv_distributed(spark, path, delim, policy, with_headers,
                                 comment_prefix, strip_whitespaces)


def _arrays_to_handle(spark: SparkSession, arr_df: DataFrame,
                      header: list[str] | None, width: int | None) -> TableHandle:
    """fields-array DataFrame → fixed-width handle (+ per-row NF)."""
    if width is None:
        width = arr_df.agg(F.max(F.size('fields'))).collect()[0][0] or 1
    if header is not None:
        width = max(width, len(header))
    cols = [F.try_element_at('fields', F.lit(i + 1)).alias('_c{}'.format(i)) for i in range(width)]
    cols.append(F.size('fields').alias(NF_SRC_COL))
    return TableHandle(df=arr_df.select(cols), header=header)


def _read_csv_distributed(spark, path, delim, policy, with_headers,
                          comment_prefix, strip_whitespaces) -> TableHandle:
    """utf-8 line-based policies: fully distributed text scan + native split."""
    # spark.read.text silently replaces invalid UTF-8; the reference raises
    # (rbql_csv.py:416-417).  Validate eagerly for local files (the parity
    # path; bulk data should be parquet or native=True anyway).
    if os.path.exists(path):
        try:
            with open(path, 'rb') as f:
                f.read().decode('utf-8')
        except UnicodeDecodeError:
            raise RbqlIOHandlingError(
                'Unable to decode input table as UTF-8. Use binary (latin-1) encoding instead')
    df = spark.read.text(path)
    line = F.regexp_replace(F.col('value'), r'\r$', '')
    line = F.regexp_replace(line, '^﻿', '')  # BOM (file head in practice)
    df = df.select(line.alias('value'))
    if comment_prefix:
        df = df.filter(~F.col('value').startswith(comment_prefix))

    if policy == 'simple':
        arr = F.split(F.col('value'), re.escape(delim), -1)
    elif policy == 'whitespace':
        trimmed = F.regexp_replace(F.regexp_replace(F.col('value'), '^ +', ''), ' +$', '')
        arr = F.when(trimmed == '', F.array(F.lit('')))\
               .otherwise(F.split(trimmed, ' +', -1))
    elif policy == 'monocolumn':
        arr = F.array(F.col('value'))
    elif policy == 'quoted':
        return _quoted_distributed(spark, df, delim, with_headers,
                                   strip_whitespaces, comment_prefix, path)
    else:
        raise RbqlIOHandlingError('unknown split policy: ' + policy)

    if strip_whitespaces:
        arr = F.transform(arr, lambda x: F.trim(x))
    arr_df = df.select(arr.alias('fields'))

    header = None
    if with_headers:
        header = _read_header_line(path, delim, policy, 'utf-8', comment_prefix,
                                   strip_whitespaces)
        arr_df = _drop_first_row(arr_df)
    return _arrays_to_handle(spark, arr_df, header, None)


def _quoted_distributed(spark, lines_df, delim, with_headers, strip_whitespaces,
                        comment_prefix, path) -> TableHandle:
    """quoted (single-line) policy: Arrow-batched Python splitter."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField('fields', T.ArrayType(T.StringType()), True),
        T.StructField('__bad_quoting', T.BooleanType(), True),
    ])
    dlm = delim
    strip = strip_whitespaces

    def run(batches):
        import pandas as pd
        for pdf in batches:
            fields_out, warn_out = [], []
            for src in pdf['value'].tolist():
                fields, warning = split_quoted(src if src is not None else '', dlm)
                if strip:
                    fields = [f.strip() for f in fields]
                fields_out.append(fields)
                warn_out.append(warning)
            yield pd.DataFrame({'fields': fields_out, '__bad_quoting': warn_out})

    arr_df = lines_df.mapInPandas(run, schema=schema).select('fields')
    header = None
    if with_headers:
        header = _read_header_line(path, delim, 'quoted', 'utf-8', comment_prefix,
                                   strip_whitespaces)
        arr_df = _drop_first_row(arr_df)
    return _arrays_to_handle(spark, arr_df, header, None)


def _drop_first_row(arr_df: DataFrame) -> DataFrame:
    mid = F.monotonically_increasing_id()
    d = arr_df.withColumn('__mid', mid)
    first = d.agg(F.min('__mid')).collect()[0][0]
    return d.filter(F.col('__mid') != first).drop('__mid')


def _read_header_line(path, delim, policy, encoding, comment_prefix,
                      strip_whitespaces) -> list[str]:
    with open(path, 'r', encoding=encoding, newline='') as f:
        for raw in f:
            line = raw.rstrip('\r\n')
            line, _bom = _strip_bom(line)
            if comment_prefix and line.startswith(comment_prefix):
                continue
            if policy == 'simple':
                fields = line.split(delim)
            elif policy == 'whitespace':
                fields = split_whitespace(line)
            elif policy == 'monocolumn':
                fields = [line]
            else:
                fields, _ = split_quoted(line, delim)
            if strip_whitespaces:
                fields = [x.strip() for x in fields]
            return fields
    return []


def _read_csv_driver_side(spark, path, delim, policy, encoding, with_headers,
                          comment_prefix, strip_whitespaces) -> TableHandle:
    """latin-1 / multiline-RFC path: decode + record-assemble on the driver,
    then parallelize.  legacy-file path, documented as non-bulk."""
    with open(path, 'rb') as f:
        content = f.read().decode(encoding)
    content, _bom = _strip_bom(content)
    if policy == 'quoted_rfc':
        recs = _record_split_rfc(content, delim, comment_prefix=comment_prefix)
    else:
        rows = [ln for ln in re.split(r'\r\n|\r|\n', content)]
        if rows and rows[-1] == '':
            rows.pop()
        if comment_prefix:
            rows = [ln for ln in rows if not ln.startswith(comment_prefix)]
        if policy == 'simple':
            records = [(ln.split(delim), False) for ln in rows]
        elif policy == 'whitespace':
            records = [(split_whitespace(ln), False) for ln in rows]
        elif policy == 'monocolumn':
            records = [([ln], False) for ln in rows]
        else:
            records = [split_quoted(ln, delim) for ln in rows]
        recs = [r[0] for r in records]
    if strip_whitespaces:
        recs = [[f.strip() for f in r] for r in recs]
    header = None
    if with_headers and recs:
        header = recs.pop(0)
    width = max((len(r) for r in recs), default=1)
    if header is not None:
        width = max(width, len(header))
    padded = [tuple(r + [None] * (width - len(r)) + [len(r)]) for r in recs]
    from pyspark.sql import types as T
    fields = [T.StructField('_c{}'.format(i), T.StringType(), True) for i in range(width)]
    fields.append(T.StructField(NF_SRC_COL, T.IntegerType(), True))
    schema = T.StructType(fields)
    df = spark.createDataFrame(padded, schema=schema) if padded else \
        spark.createDataFrame([], schema=schema)
    return TableHandle(df=df, header=header)


def _read_csv_native(spark, path, delim, policy, with_headers, encoding,
                     comment_prefix) -> TableHandle:
    """Bulk-scale path: Spark's own CSV reader (multiLine for RFC records).
    No ragged-row NF tracking — fixed schema, nulls for missing fields."""
    reader = (spark.read
              .option('sep', delim)
              .option('header', 'true' if with_headers else 'false')
              .option('quote', '"')
              .option('escape', '"')
              .option('encoding', encoding)
              .option('mode', 'PERMISSIVE'))
    if policy == 'quoted_rfc':
        reader = reader.option('multiLine', 'true')
    if comment_prefix and len(comment_prefix) == 1:
        reader = reader.option('comment', comment_prefix)
    df = reader.csv(path)
    header = list(df.columns) if with_headers else None
    if not with_headers:
        df = df.toDF(*['_c{}'.format(i) for i in range(len(df.columns))])
    return TableHandle(df=df, header=header)


# ---------------------------------------------------------------------------
# sink

def _normalize_out_value(v, delim: str, warnings: set[str]) -> str:
    if v is None:
        warnings.add('None values in output were replaced by empty strings')
        return ''
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return 'True' if v else 'False'
    if isinstance(v, (list, tuple)):
        sub = ';' if delim == '|' else '|'
        return sub.join(_normalize_out_value(x, delim, warnings) for x in v)
    return str(v)


def _quote_field(s: str, delim: str) -> str:
    if delim in s or '"' in s or '\n' in s or '\r' in s:
        return '"' + s.replace('"', '""') + '"'
    return s


def write_csv(result, output_path: str, delim: str = ',', policy: str = 'quoted',
              encoding: str = 'utf-8') -> list[str]:
    """Stream the (ordered) result to one CSV file with the reference's
    output-normalization rules (rbql_csv.py:146-315): ragged-width trimming,
    int-preserving aggregates, None→'' with a warning, policy-aware quoting.
    Driver-side single-file sink (the reference CLI shape); use
    df.write.csv for distributed many-file output."""
    from ..api import collect_result_rows
    warnings: set[str] = set()
    header = result.out_names

    def fmt_row(vals) -> str:
        normd = [_normalize_out_value(v, delim, warnings) for v in vals]
        if policy in ('quoted', 'quoted_rfc'):
            normd = [_quote_field(s, delim) for s in normd]
        elif policy == 'simple':
            for s in normd:
                if delim in s:
                    warnings.add('Some output fields contain separator')
        elif policy == 'whitespace':
            return ' '.join(normd)
        elif policy == 'monocolumn':
            return normd[0] if normd else ''
        return delim.join(normd)

    rows = collect_result_rows(result)
    with open(output_path, 'w', encoding=encoding, newline='') as f:
        if header is not None:
            f.write(fmt_row(header))
            f.write('\n')
        for vals in rows:
            if header is not None and len(vals) != len(header):
                # reference CSVWriter width guard (rbql_csv.py:209-210)
                raise RbqlIOHandlingError(
                    'Inconsistent number of columns in output header and the '
                    'current record: {} != {}'.format(len(vals), len(header)))
            f.write(fmt_row(vals))
            f.write('\n')
    return sorted(warnings)
