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
        # 1-arg: epoch millis of a timestamp; 2-arg: ms(a) - ms(b)
        # (ValueSourceParser "ms" registration: date math difference)
        def _ms(a):
            v = col_expr(batch, a)
            t = v.type
            if pa.types.is_timestamp(t):
                iv = pc.cast(v, pa.int64())
                if t.unit == "s":
                    return pc.multiply(iv, 1000)
                if t.unit == "ms":
                    return iv
                if t.unit == "us":
                    return pc.divide(iv, 1000)
                return pc.divide(iv, 1_000_000)
            return pc.cast(v, pa.int64())

        if len(args) == 1:
            return _ms(args[0])
        return pc.subtract(_ms(args[0]), _ms(args[1]))
    if head == "sqedist":
        # SquaredEuclideanFunction (ValueSourceParser 'sqedist'): first half
        # of the args is point A's components, second half point B's
        vals = [col_expr(batch, a) for a in args]
        if len(vals) < 2 or len(vals) % 2:
            raise ValueError("sqedist needs an even number of components")
        h = len(vals) // 2
        out = None
        for i in range(h):
            d = pc.subtract(
                pc.cast(vals[i], pa.float64()), pc.cast(vals[h + i], pa.float64())
            )
            sq = pc.multiply(d, d)
            out = sq if out is None else pc.add(out, sq)
        return out
    if head in ("ord", "rord"):
        # OrdFieldSource / ReverseOrdFieldSource: 1-based rank of the value
        # in the field's sorted distinct values (the term dictionary —
        # dense_rank in SQL). The dictionary is computed ONCE per pipeline
        # (a tiny distinct aggregate, the analog of reading the index's
        # sorted term dict) and passed as the literal second argument;
        # values absent from the dictionary yield null.
        x = col_expr(batch, args[0])
        values = list(args[1])
        idx = pc.index_in(x, value_set=pa.array(values))
        idx64 = pc.cast(idx, pa.int64())
        if head == "ord":
            return pc.add(idx64, 1)
        return pc.subtract(pa.scalar(len(values), pa.int64()), idx64)
    if head == "payload":
        # PayloadValueSourceParser 'payload(field, term, default)': the
        # index read (payload channel for the term) is surfaced as a column
        # by the pipeline stage (IndexReader.payload_scores join); this
        # function applies the default for docs without the term.
        x = col_expr(batch, args[0])
        return pc.fill_null(pc.cast(x, pa.float64()), pa.scalar(float(args[1])))
    if head == "strdist":
        # Lucene LevenshteinDistance.getDistance: 1 - lev(a,b)/max(len) —
        # vectorized DP against a constant query string (no per-row Python)
        x = col_expr(batch, args[0])
        q = args[1]
        if not isinstance(q, str) or q in batch.column_names:
            raise ValueError("strdist requires a literal second argument")
        return _strdist_const(x, q)
    if head in _BINARY:
        vals = [col_expr(batch, a) for a in args]
        out = vals[0]
        for v in vals[1:]:
            out = _BINARY[head](out, v)
        return out
    if head in _UNARY:
        return _UNARY[head](col_expr(batch, args[0]))
    raise KeyError(f"unknown function {head!r}")


def _strdist_const(arr, q: str):
    """1 - levenshtein(s, q)/max(len(s), len(q)) for every string in
    ``arr`` vs the constant ``q`` — the whole batch advances through one
    shared DP whose row axis is vectorized in numpy (no per-row Python
    loop): O(len(q) × max_len) numpy ops per batch, each O(n_rows)."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], pa.float64())
    lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    max_len = int(lens.max())
    # padded code-point matrix straight from the Arrow buffers (ASCII-safe;
    # non-ASCII falls back to per-row ord once, still bounded by the batch)
    a = pc.cast(arr, pa.string())
    buf = np.frombuffer(a.buffers()[2], dtype=np.uint8) if a.buffers()[2] else np.zeros(0, np.uint8)
    off = np.frombuffer(a.buffers()[1], dtype=np.int32)[a.offset : a.offset + n + 1]
    byte_lens = (off[1:] - off[:-1]).astype(np.int64)
    if np.array_equal(byte_lens, lens):  # pure ASCII: bytes == code points
        idx = off[:-1, None].astype(np.int64) + np.arange(max_len)[None, :]
        valid = np.arange(max_len)[None, :] < lens[:, None]
        M = np.where(valid, buf[np.clip(idx, 0, max(len(buf) - 1, 0))], 0)
    else:
        M = np.zeros((n, max_len), dtype=np.int64)
        for i, s_ in enumerate(arr.to_pylist()):
            for j, ch in enumerate(s_ or ""):
                M[i, j] = ord(ch)
    qcodes = np.array([ord(c) for c in q], dtype=np.int64)
    # DP over (i: q chars) x (j: candidate positions); rows vectorized
    prev = np.broadcast_to(np.arange(max_len + 1, dtype=np.int64), (n, max_len + 1)).copy()
    for i in range(1, len(qcodes) + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, max_len + 1):
            sub = prev[:, j - 1] + (M[:, j - 1] != qcodes[i - 1])
            cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub)
        prev = cur
    dist = prev[np.arange(n), lens]
    denom = np.maximum(lens, len(q)).astype(np.float64)
    return pa.array(1.0 - dist.astype(np.float64) / denom, pa.float64())


def add_computed(out_name: str, expr):
    """map_batches stage appending a computed column."""

    def run(t: pa.Table) -> pa.Table:
        v = col_expr(t, expr)
        if isinstance(v, pa.Scalar):
            import numpy as np

            v = pa.array(np.full(t.num_rows, v.as_py()))
        return t.append_column(out_name, v)

    return run


def distinct_sorted(ds, col: str) -> tuple:
    """The sorted distinct values of a column (the 'term dictionary' the
    ord/rord functions rank against) via one streaming groupby — cardinality
    is assumed bounded (categorical field), exactly the fields Solr's
    OrdFieldSource targets."""
    rows = ds.groupby(col).count().take_all()
    return tuple(sorted(r[col] for r in rows))


REGISTERED = sorted(set(_BINARY) | set(_UNARY) | set(_CONST) | {
    "if", "def", "linear", "recip", "scale", "map", "concat", "ms", "strdist",
    "sqedist", "ord", "rord", "payload",
})
