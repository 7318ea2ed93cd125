"""Command-line entry point (analog of the reference CLI, rbql_main.py).

    python -m rbql_spark --query "SELECT a1, int(a2) WHERE int(a2) > 5" \
        --input data.csv --delim , --policy quoted --output out.csv

Dialect flags and defaults follow the reference (delimiter → default policy
map rbql_main.py:34-40; autodetection rbql_main.py:128-166 when no delimiter
is given).
"""

from __future__ import annotations

import argparse
import os
import sys

POLICIES = ['quoted', 'simple', 'whitespace', 'monocolumn', 'quoted_rfc']


def default_policy_for_delim(delim: str) -> str:
    if delim in (';', ','):
        return 'quoted'
    if delim == ' ':
        return 'whitespace'
    return 'simple'


def autodetect_dialect(path: str, encoding: str) -> tuple[str, str]:
    """Sample the head of the file and pick (delim, policy) by the most
    consistent field count over candidate dialects (reference
    rbql_main.py:128-166 behavior, original implementation)."""
    from .sources.csv import split_quoted
    try:
        with open(path, 'r', encoding=encoding, newline='') as f:
            lines = []
            for _ in range(10):
                ln = f.readline()
                if not ln:
                    break
                lines.append(ln.rstrip('\r\n'))
    except OSError:
        return ',', 'quoted'
    if not lines:
        return ',', 'quoted'
    best = (',', 'quoted', 0)
    for delim, policy in [('\t', 'simple'), (',', 'quoted'), (';', 'quoted'), ('|', 'simple')]:
        counts = []
        for ln in lines:
            if policy == 'quoted':
                fields, _w = split_quoted(ln, delim)
            else:
                fields = ln.split(delim)
            counts.append(len(fields))
        if len(set(counts)) == 1 and counts[0] > 1 and counts[0] > best[2]:
            best = (delim, policy, counts[0])
    if best[2] == 0:
        ext = os.path.splitext(path)[1].lower()
        if ext == '.tsv':
            return '\t', 'simple'
        return ',', 'quoted'
    return best[0], best[1]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog='rbql_spark', description='PySpark-native RBQL query engine')
    p.add_argument('--query', required=True, help='RBQL query text')
    p.add_argument('--input', help='input CSV/TSV/JSONL/parquet path (default: stdin CSV not supported — provide a file)')
    p.add_argument('--output', help='output path (default: stdout)')
    p.add_argument('--delim', default=None, help='field delimiter (autodetected if omitted)')
    p.add_argument('--policy', choices=POLICIES, default=None)
    p.add_argument('--with-headers', action='store_true', help='first row is a header')
    p.add_argument('--encoding', default='utf-8', choices=['utf-8', 'latin-1'])
    p.add_argument('--comment-prefix', default=None)
    p.add_argument('--strip-spaces', action='store_true', dest='strip_spaces')
    p.add_argument('--out-delim', default=None)
    p.add_argument('--out-policy', choices=POLICIES, default=None)
    p.add_argument('--init-source-file', default=None,
                   help='python file exec-ed into the query scope (UDFs)')
    p.add_argument('--color', action='store_true',
                   help='colorize columns in terminal output (stdout only)')
    p.add_argument('--version', action='version', version='rbql_spark 0.1.0')
    p.add_argument('--cpus', type=int, default=os.cpu_count() or 4)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from .api import query_csv
    from .errors import exception_to_error_info
    from .sources.csv import write_csv

    if not args.input:
        print('Error [IO handling]: --input file is required', file=sys.stderr)
        return 1

    delim = args.delim
    policy = args.policy
    if delim is None and policy is None:
        delim, policy = autodetect_dialect(args.input, args.encoding)
    elif delim is None:
        delim = ','
    if policy is None:
        policy = default_policy_for_delim(delim)
    if delim == 'TAB':
        delim = '\t'

    user_init_code = ''
    if args.init_source_file:
        with open(args.init_source_file, encoding='utf-8') as f:
            user_init_code = f.read()
    else:
        default_init = os.path.expanduser('~/.rbql_init_source.py')
        if os.path.exists(default_init):
            with open(default_init, encoding='utf-8') as f:
                user_init_code = f.read()

    spark = (SparkSession.builder
             .master('local[{}]'.format(args.cpus))
             .appName('rbql-spark-cli')
             .config('spark.sql.shuffle.partitions', str(args.cpus))
             .config('spark.sql.adaptive.enabled', 'true')
             .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
             .config('spark.ui.enabled', 'false')
             .getOrCreate())
    spark.sparkContext.setLogLevel('ERROR')
    try:
        result = query_csv(spark, args.query, args.input,
                           delim=delim, policy=policy, encoding=args.encoding,
                           with_headers=args.with_headers,
                           comment_prefix=args.comment_prefix,
                           strip_whitespaces=args.strip_spaces,
                           user_init_code=user_init_code)
        out_delim = args.out_delim if args.out_delim is not None else delim
        out_policy = args.out_policy if args.out_policy is not None else policy
        if args.output:
            warnings = write_csv(result, args.output, delim=out_delim,
                                 policy=out_policy, encoding=args.encoding)
        elif args.color:
            # cyclic per-column ANSI foreground colors (reference
            # rbql_csv.py:129-144 behavior, terminal preview only)
            from .api import collect_result_rows
            colors = ['\u001b[{}m'.format(c) for c in range(31, 38)]
            reset = '\u001b[0m'
            rows = collect_result_rows(result)
            header = result.out_names
            warnings = list(result.warnings)
            def emit(vals):
                parts = []
                for i, v in enumerate(vals):
                    s_val = '' if v is None else (v if isinstance(v, str) else str(v))
                    parts.append(colors[i % len(colors)] + s_val)
                sys.stdout.write(out_delim.join(parts) + reset + '\n')
            if header is not None:
                emit(header)
            for vals in rows:
                emit(vals)
        else:
            import tempfile
            with tempfile.NamedTemporaryFile('r', suffix='.csv', delete=False) as tf:
                tmp_name = tf.name
            warnings = write_csv(result, tmp_name, delim=out_delim,
                                 policy=out_policy, encoding=args.encoding)
            with open(tmp_name, encoding=args.encoding) as f:
                sys.stdout.write(f.read())
            os.unlink(tmp_name)
        for w in warnings:
            print('Warning: ' + w, file=sys.stderr)
        return 0
    except Exception as e:
        err_type, err_msg = exception_to_error_info(e)
        print('Error [{}]: {}'.format(err_type, err_msg), file=sys.stderr)
        return 1
    finally:
        spark.stop()


if __name__ == '__main__':
    sys.exit(main())
