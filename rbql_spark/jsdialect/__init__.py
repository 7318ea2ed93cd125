"""JavaScript expression dialect front-end.

The reference ships two expression dialects over the same RBQL grammar:
Python (rbql-py/rbql/rbql_engine.py) and JavaScript (rbql-js/rbql.js).
This package is the JS front-end for the Spark engine: JS expression
text is parsed (jsparser), then transpiled (transpile) into the Python
expression surface the rest of the engine already understands — plain
Python where the two languages agree, ``__js__.<op>(…)`` runtime-helper
calls (runtime) where ECMAScript semantics diverge (ToNumber/ToString
coercion, loose equality, value-returning ``&&``/``||``, remainder sign,
division by zero, NaN).  One engine, two front-ends: the native
Column translator recognizes the helper shapes and keeps the common
subset JVM-side (predicate pushdown included); everything else rides
the existing Arrow-batched evaluator with the helpers in scope.
"""

from .transpile import js_expr_to_python, js_update_target_to_python
from .jsparser import JsSyntaxError

__all__ = ['js_expr_to_python', 'js_update_target_to_python', 'JsSyntaxError']
