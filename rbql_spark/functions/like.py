"""SQL-LIKE-as-a-function, matching the reference semantics.

Reference: ``like_to_regex`` + ``LIKE`` closure with a compiled-regex cache
(rbql_engine.py:267-281, :832-837).  ``%`` → ``.*``, ``_`` → ``.``, everything
else literal, pattern anchored at both ends, NO escape character.
"""

from __future__ import annotations

import re

_CACHE: dict[str, 're.Pattern[str]'] = {}


def like_to_regex(pattern: str) -> str:
    out: list[str] = ['^']
    chunk_start = 0
    for i, ch in enumerate(pattern):
        if ch in ('_', '%'):
            out.append(re.escape(pattern[chunk_start:i]))
            out.append('.' if ch == '_' else '.*')
            chunk_start = i + 1
    out.append(re.escape(pattern[chunk_start:]))
    out.append('$')
    return ''.join(out)


def like_to_java_regex(pattern: str) -> str:
    """Same conversion for the JVM regex engine (used by ``Column.rlike``).

    ``re.escape`` only escapes regex metacharacters (Python ≥3.7), all of
    which Java escapes identically, so the Python translation is reusable.
    """
    return like_to_regex(pattern)


def py_like(text: str, pattern: str) -> bool:
    """Driver/Python-side like() for the fallback evaluator."""
    matcher = _CACHE.get(pattern)
    if matcher is None:
        matcher = re.compile(like_to_regex(pattern))
        _CACHE[pattern] = matcher
    return matcher.match(text) is not None
