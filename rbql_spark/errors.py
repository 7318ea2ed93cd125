"""Error taxonomy mirroring the reference engine's observable surface.

Reference behavior: /root/reference/rbql-py/rbql/rbql_engine.py:55-63 (class
hierarchy) and :950-975 (``exception_to_error_info`` mapping incl. targeted
hints for HAVING / LIKE / FROM misuse).  Implementation here is original.
"""

from __future__ import annotations

import re


class RbqlError(Exception):
    """Base class for all engine errors."""


class RbqlParsingError(RbqlError):
    pass


class RbqlRuntimeError(RbqlError):
    pass


class RbqlIOHandlingError(RbqlError):
    pass


AMBIGUOUS_VARIABLE_ERROR = 'Ambiguous variable name: "{}" is present both in input and in join tables'
INVALID_KEYWORD_IN_AGGREGATE_QUERY_ERROR = '"ORDER BY", "UPDATE" and "DISTINCT" keywords are not allowed in aggregate queries'
WRONG_AGGREGATION_USAGE_ERROR = 'Usage of RBQL aggregation functions inside Python expressions is not allowed, see the docs'
NUMERIC_CONVERSION_ERROR = (
    'Unable to convert value "{}" to int or float. MIN, MAX, SUM, AVG, MEDIAN and'
    ' VARIANCE aggregate functions convert their string arguments to numeric values'
)

# JS-dialect wordings (rbql-js/rbql.js:72,286)
WRONG_AGGREGATION_USAGE_ERROR_JS = 'Usage of RBQL aggregation functions inside JavaScript expressions is not allowed, see the docs'
NUMERIC_CONVERSION_ERROR_JS = (
    'Unable to convert value "{}" to a number. MIN, MAX, SUM, AVG, MEDIAN and'
    ' VARIANCE aggregate functions convert their string arguments to numeric values'
)


def wrong_aggregation_usage_error(dialect: str) -> str:
    return WRONG_AGGREGATION_USAGE_ERROR_JS if dialect == 'js' else WRONG_AGGREGATION_USAGE_ERROR


def exception_to_error_info(e: BaseException) -> tuple[str, str]:
    """Map an exception to the reference's ``(error_type, error_msg)`` pairs.

    Parity target: rbql_engine.py:950-975.
    """
    if isinstance(e, SyntaxError):
        import traceback
        error_strings = traceback.format_exception_only(type(e), e)
        if error_strings and re.search('File.*line', error_strings[0]) is not None:
            error_strings[0] = '\n'
        error_msg = ''.join(error_strings).rstrip()
        if re.search(' having ', error_msg, flags=re.IGNORECASE):
            error_msg += '\nRBQL doesn\'t support "HAVING" keyword'
        if re.search(' like[ (]', error_msg, flags=re.IGNORECASE):
            error_msg += (
                '\nRBQL doesn\'t support "LIKE" operator, use like() function instead '
                "e.g. ... WHERE like(a1, 'foo%bar') ... "
            )
        if error_msg.lower().find(' from ') != -1:
            error_msg += (
                '\nTip: If input table is defined by the environment, RBQL query '
                'should not have "FROM" keyword'
            )
        if error_msg.lower().find('unexpected identifier') != -1:
            # JS-dialect and/or misuse hints (rbql-js/rbql.js:1002-1005: the
            # reference inspects the query for ' and '/' or ' when V8 reports
            # an unexpected identifier; the offending expression text is
            # embedded in our message, so the same containment check works)
            if re.search(' and ', error_msg, flags=re.IGNORECASE):
                error_msg += ("\nDid you use 'and' keyword in your query?\n"
                              "JavaScript backend doesn't support 'and' keyword, "
                              "use '&&' operator instead!")
            elif re.search(' or ', error_msg, flags=re.IGNORECASE):
                error_msg += ("\nDid you use 'or' keyword in your query?\n"
                              "JavaScript backend doesn't support 'or' keyword, "
                              "use '||' operator instead!")
        return ('syntax error', error_msg)
    if isinstance(e, RbqlRuntimeError):
        return ('query execution', str(e))
    if isinstance(e, RbqlParsingError):
        return ('query parsing', str(e))
    if isinstance(e, RbqlIOHandlingError):
        return ('IO handling', str(e))
    return ('unexpected', str(e))
