"""Streaming-expression front-end — the solrj-streaming DSL compiled onto
Ray Data (reference ``solr/solrj-streaming/src/java/org/apache/solr/client/
solrj/io/stream/expr/StreamExpressionParser.java`` parses the text into a
``TupleStream`` tree via ``StreamFactory.java``; each decorator stream is a
class in ``.../io/stream/``). This module is that surface rebuilt: a
recursive parser for the nested-call syntax and a compiler mapping each
decorator onto the same Ray Data building blocks the operator catalog uses.

Supported decorators (each cites its reference stream):

- ``search(table, q="f:v"|"f:[lo TO hi]"|"*:*", fl="a,b", sort="a asc,b desc")``
  — CloudSolrStream/SearchStream: column-pruned scan + vectorized filter
  (+ explicit sort only when a downstream op needs the order);
- ``select(stream, "a as b", "c")`` — SelectStream: projection/rename;
- ``rollup(stream, over="a,b", sum(x), min(x), max(x), avg(x), count(*))``
  — RollupStream: per-batch partials + one groupby (partial aggregation is
  exactly RollupStream's worker-side combiner);
- ``innerJoin(l, r, on="k"|"lk=rk")`` / ``leftOuterJoin(...)`` /
  ``hashJoin(l, hashed=r, on=...)`` — JoinStreams: ONE key-hash co-location
  (grouped_map cogroup) + vectorized pandas merge per partition;
- ``unique(stream, over="f")`` — UniqueStream: keep the first tuple per key
  in the stream's declared sort order;
- ``top(stream, n=5, sort="a desc")`` — RankStream: distributed
  sort+limit;
- ``having(stream, eq|gt|lt|gteq|lteq|and|or|not(...))`` — HavingStream:
  boolean predicate over tuples;
- ``cartesianProduct(stream, "field [as name]")`` — CartesianProductStream:
  explode a multivalued field, one tuple per element (vectorized unnest);
- ``parallel(stream, workers=N, sort=...)`` — ParallelStream: Ray's
  executor already runs the compiled inner pipeline data-parallel, so
  workers maps to the output partition count + the declared merge sort;
- ``let(x=col(stream, "f"), ..., expr)`` — LetStream + the ``io/eval/``
  math-evaluator pack (corr, regress, predict, movingAvg/Median,
  percentile, describe, hist, precision, zscores, ebe*/dot/cosine, ...)
  via ``apache___solr_ray.mathexpr``; col() vectors are guarded
  driver-side state, everything upstream stays distributed;
- ``sql(collection, stmt=...)`` — SqlStream: the SQL front-end as a
  composable stream source;
- ``fullOuterJoin(l, r, on=...)`` / ``outerHashJoin(stream, hashed=, on=)``
  — FullOuterJoinStream (cogroup, both sides' unmatched rows survive) /
  OuterHashJoinStream (LEFT outer on a broadcast build side);
- ``facet2D(collection, x=, y=, dimensions="nX,nY", metric)`` —
  Facet2DStream: top-nX x buckets, per-x top-nY y buckets;
- ``significantTerms(collection, q=, field=, minDocFreq=, limit=)`` —
  SignificantTermsStream: fg/bg docFreq partials merged in one groupby;
- ``csv(cat(...))`` / ``tsv(cat(...))`` — CsvStream/TsvStream: header-led
  file parsing on Ray's parallel read_csv;
- ``drill(collection, q=, fl=, rollup(input(), ...))`` — DrillStream:
  the inner expression compiled with input() bound to the scan.

Scale notes: the only shuffles are rollup's groupby-over-partials, the
join's single co-location and top's sort — the decorators compose without
materializing; ``unique``/joins state the partitioning assumption (all
rows of a key fit one partition).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class StreamExprError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Parser (StreamExpressionParser analog): name(arg, arg, key=value, ...)
# ---------------------------------------------------------------------------


@dataclass
class Node:
    name: str
    args: list = field(default_factory=list)  # Node | str (positional)
    params: dict = field(default_factory=dict)  # key -> str | Node


_TOK = re.compile(
    r"\s*(?:"
    r'(?P<str>"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\')'
    r"|(?P<word>[A-Za-z_][A-Za-z_0-9.]*)"
    r"|(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<op>[(),=*])"
    r")"
)


def _tokens(s: str):
    out, pos = [], 0
    while pos < len(s):
        m = _TOK.match(s, pos)
        if m is None:
            rest = s[pos:].strip()
            if not rest:
                break
            raise StreamExprError(f"cannot tokenize near {rest[:30]!r}")
        pos = m.end()
        if m.lastgroup == "str":
            raw = m.group("str")
            out.append(("str", raw[1:-1].replace('\\"', '"').replace("\\'", "'")))
        elif m.lastgroup == "word":
            out.append(("word", m.group("word")))
        elif m.lastgroup == "num":
            out.append(("num", m.group("num")))
        else:
            out.append(("op", m.group("op")))
    return out


class _P:
    def __init__(self, s: str):
        self.t = _tokens(s)
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.t[j] if j < len(self.t) else (None, None)

    def next(self):
        v = self.peek()
        self.i += 1
        return v

    def parse(self) -> Node:
        node = self.call()
        if self.peek() != (None, None):
            raise StreamExprError(f"trailing tokens at {self.peek()}")
        return node

    def call(self) -> Node:
        typ, name = self.next()
        if typ != "word":
            raise StreamExprError(f"expected function name, got {typ} {name!r}")
        if self.next() != ("op", "("):
            raise StreamExprError(f"expected '(' after {name}")
        node = Node(name)
        if self.peek() == ("op", ")"):
            self.i += 1
            return node
        while True:
            node_or_kv = self._argument()
            if isinstance(node_or_kv, tuple):
                node.params[node_or_kv[0]] = node_or_kv[1]
            else:
                node.args.append(node_or_kv)
            typ, v = self.next()
            if (typ, v) == ("op", ")"):
                return node
            if (typ, v) != ("op", ","):
                raise StreamExprError(f"expected ',' or ')', got {typ} {v!r}")

    def _argument(self):
        typ, v = self.peek()
        if typ == "word" and self.peek(1) == ("op", "("):
            return self.call()
        if typ == "word" and self.peek(1) == ("op", "="):
            key = v
            self.i += 2
            t2, v2 = self.peek()
            if t2 == "word" and self.peek(1) == ("op", "("):
                return (key, self.call())
            self.i += 1
            if t2 not in ("str", "word", "num"):
                raise StreamExprError(f"bad value for {key}: {t2} {v2!r}")
            return (key, v2)
        if typ in ("str", "word", "num"):
            self.i += 1
            return v
        if (typ, v) == ("op", "*"):  # count(*)
            self.i += 1
            return "*"
        raise StreamExprError(f"unexpected token {typ} {v!r}")


def parse_stream_expr(s: str) -> Node:
    return _P(s).parse()


# ---------------------------------------------------------------------------
# Compiler — every op returns (Dataset, sort_spec | None); sort_spec is the
# declared tuple order ([(col, desc)]), used by unique() and checked by the
# merge joins (the reference's streams carry the same sort contract).
# ---------------------------------------------------------------------------


def _parse_sort(spec: str):
    out = []
    for part in spec.split(","):
        bits = part.split()
        if not bits:
            continue
        desc = len(bits) > 1 and bits[1].lower() == "desc"
        out.append((bits[0], desc))
    return out


def _q_filter(qs: str):
    """Compile the search() q subset: '*:*', 'field:value',
    'field:[lo TO hi]' (numeric, inclusive)."""
    qs = qs.strip()
    if qs == "*:*":
        return None, None
    m = re.match(r"^(\w+):\[(\S+)\s+TO\s+(\S+)\]$", qs)
    if m:
        f, lo, hi = m.group(1), m.group(2), m.group(3)

        def rng(t: pa.Table) -> pa.Table:
            col = t.column(f)
            mask = pa.array(np.ones(t.num_rows, dtype=bool))
            if lo != "*":
                mask = pc.and_(mask, pc.greater_equal(col, float(lo)))
            if hi != "*":
                mask = pc.and_(mask, pc.less_equal(col, float(hi)))
            return t.filter(mask)

        return rng, f
    m = re.match(r"^(\w+):(\S+)$", qs)
    if m:
        f, v = m.group(1), m.group(2)

        def eq(t: pa.Table) -> pa.Table:
            col = t.column(f)
            val: object = v
            if pa.types.is_integer(col.type):
                val = int(v)
            elif pa.types.is_floating(col.type):
                val = float(v)
            return t.filter(pc.equal(col, pa.scalar(val)))

        return eq, f
    raise StreamExprError(f"unsupported q syntax {qs!r}")


def _compile(node: Node, sf_dir: str):
    name = node.name
    fn = _OPS.get(name)
    if fn is None:
        raise StreamExprError(f"unknown stream decorator {name!r}")
    return fn(node, sf_dir)


def _op_search(node: Node, sf_dir: str):
    from apache___solr_ray.sources import load

    if not node.args:
        raise StreamExprError("search() needs a collection name")
    table = node.args[0]
    fl = [c.strip() for c in node.params.get("fl", "").split(",") if c.strip()]
    if not fl:
        raise StreamExprError("search() requires fl= (explicit field list)")
    qs = node.params.get("q", "*:*")
    flt, qfield = _q_filter(qs)
    cols = sorted(set(fl) | ({qfield} if qfield else set()))
    ds = load(sf_dir, table, columns=cols)
    if flt is not None:
        ds = ds.map_batches(flt, batch_format="pyarrow")
    if set(cols) != set(fl):
        ds = ds.map_batches(
            lambda t, _fl=list(fl): t.select(_fl), batch_format="pyarrow"
        )
    sort = _parse_sort(node.params["sort"]) if "sort" in node.params else None
    # rows= truncates like the /select handler's rows param (the reference's
    # search() pages; /export — shuffle/export aliases — streams everything,
    # so rows only binds on the literal search() name)
    if node.name == "search" and "rows" in node.params:
        if sort:
            ds = ds.sort([c for c, _ in sort], descending=[d for _, d in sort])
        ds = ds.limit(int(node.params["rows"]))
    # the sort contract is declared lazily: ops that NEED the order
    # (unique, top output) apply it; a plain scan stays unsorted
    return ds, sort


def _parse_value_expr(src: str):
    """Parse a select() value expression string ('add(f1,f2)', nested
    calls, numeric literals, bare fields) into the prefix-tuple form
    ``functions.col_expr`` evaluates — SelectStream's evaluator operands
    (reference .../io/eval/) map onto the same registered function pack."""
    src = src.strip()
    m = re.match(r"^([A-Za-z_][A-Za-z_0-9]*)\((.*)\)$", src)
    if not m:
        if re.match(r"^-?\d+(\.\d+)?$", src):
            return float(src) if "." in src else int(src)
        if not re.match(r"^\w+$", src):
            raise StreamExprError(f"bad select value expression {src!r}")
        return src  # bare field reference
    fname, body = m.group(1), m.group(2)
    # split top-level commas
    args, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur))
    return (fname, *[_parse_value_expr(a) for a in args])


def _op_select(node: Node, sf_dir: str):
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("select() needs an inner stream")
    ds, sort = _compile(node.args[0], sf_dir)
    # select() OPERATIONS (reference ops/ReplaceWithValueOperation.java,
    # ReplaceWithFieldOperation.java): replace(field, null|value,
    # withValue=v | withField=f) rewrites the field before projection
    replaces, concats = [], []
    for a in node.args[1:]:
        if isinstance(a, Node):
            if a.name == "concat":
                # ConcatOperation (reference ops/ConcatOperation.java:
                # concat(fields="a,b", as="out", delim="-") joins the
                # stringified field values; nulls concatenate as "")
                flds = [f.strip() for f in a.params.get("fields", "").split(",") if f.strip()]
                out_name = a.params.get("as")
                if not flds or not out_name:
                    raise StreamExprError('concat() needs fields="f1,f2" and as=')
                concats.append((tuple(flds), out_name, a.params.get("delim", "-")))
                continue
            if a.name != "replace" or len(a.args) != 2:
                raise StreamExprError("select() operation must be replace(...) or concat(...)")
            fldr, match = a.args[0], a.args[1]
            wv, wf = a.params.get("withValue"), a.params.get("withField")
            if (wv is None) == (wf is None):
                raise StreamExprError("replace() needs exactly one of withValue=/withField=")
            replaces.append((fldr, match, wv, wf))
    if replaces:
        reps = tuple(replaces)

        def apply_replace(t: pa.Table, _r=reps) -> pa.Table:
            for fld, match, wv, wf in _r:
                col = t.column(fld)
                if match == "null":
                    mask = pc.is_null(col)
                else:
                    mv: object = match
                    if pa.types.is_integer(col.type):
                        mv = int(match)
                    elif pa.types.is_floating(col.type):
                        mv = float(match)
                    mask = pc.equal(col, pa.scalar(mv))
                    mask = pc.fill_null(mask, False)
                if wf is not None:
                    repl = t.column(wf).cast(col.type)
                else:
                    rv: object = wv
                    if pa.types.is_integer(col.type):
                        rv = int(wv)
                    elif pa.types.is_floating(col.type):
                        rv = float(wv)
                    repl = pa.scalar(rv, col.type)
                t = t.set_column(
                    t.column_names.index(fld), fld, pc.if_else(mask, repl, col)
                )
            return t

        ds = ds.map_batches(apply_replace, batch_format="pyarrow")
    if concats:
        ccs = tuple(concats)

        def apply_concat(t: pa.Table, _c=ccs) -> pa.Table:
            for flds, out_name, delim in _c:
                parts = [
                    pc.fill_null(pc.cast(t.column(f), pa.string()), "") for f in flds
                ]
                t = t.append_column(
                    out_name, pc.binary_join_element_wise(*parts, delim)
                )
            return t

        ds = ds.map_batches(apply_concat, batch_format="pyarrow")
    pairs = []  # (col_expr prefix form | plain column name, out name)
    for a in node.args[1:]:
        if isinstance(a, Node):
            continue  # operations handled above
        if not isinstance(a, str):
            raise StreamExprError("select() fields must be strings")
        m = re.match(r"^(.*?)(?:\s+as\s+(\w+))?$", a.strip(), re.IGNORECASE)
        src = m.group(1).strip()
        if re.fullmatch(r"recNum\(\s*\)", src):
            # RecNumEvaluator: 0-based record number in the stream's sort
            # order — attach it once, then project it like a plain column
            if not sort:
                raise StreamExprError(
                    "recNum() needs the inner stream to declare sort= (record "
                    "order is the sort contract)"
                )
            ds = _attach_recnum(ds, sort)
            pairs.append(("recNum()", m.group(2) or "recNum()"))
            continue
        expr = _parse_value_expr(src)
        if not isinstance(expr, str) and m.group(2) is None:
            raise StreamExprError(f"computed select field {a!r} needs 'as <name>'")
        pairs.append((expr, m.group(2) or src))

    def proj(t: pa.Table, _p=tuple(pairs)) -> pa.Table:
        from apache___solr_ray.functions import col_expr

        cols = {}
        for expr, dst in _p:
            v = t.column(expr) if isinstance(expr, str) else col_expr(t, expr)
            if isinstance(v, pa.Scalar):
                v = pa.array(np.full(t.num_rows, v.as_py()))
            cols[dst] = v
        return pa.table(cols)

    rename = {s: d for s, d in pairs if isinstance(s, str)}
    if sort:
        sort = [(rename.get(c, c), d) for c, d in sort]
    return ds.map_batches(proj, batch_format="pyarrow"), sort


_ROLLUP_AGGS = {"sum", "min", "max", "avg", "count", "std", "per", "countDist"}


def _op_rollup(node: Node, sf_dir: str):
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("rollup() needs an inner stream")
    ds, _ = _compile(node.args[0], sf_dir)
    over = [c.strip() for c in node.params.get("over", "").split(",") if c.strip()]
    if not over:
        raise StreamExprError("rollup() requires over=")
    return _rollup_core(ds, over, list(node.args[1:])), None


def _rollup_core(ds, over: list[str], metric_args: list):
    """RollupStream core shared by rollup()/facet()/stats()/timeseries():
    per-batch pandas partials (Arrow blocks out) + one groupby + finish.
    ``std(col)`` rides (sum, sum-of-squares, n) partials; ``per(col, pct)``
    and ``countDist(col)`` need whole groups, so their presence switches
    the plan to ONE key-hash co-location with exact pandas kernels
    (the reference's PercentileMetric is a t-digest approximation —
    DIVERGENCE, stated: this engine computes the exact percentile)."""
    from ray.data.aggregate import Max, Min, Sum

    metrics = []  # (func, col, outname, extra)
    for a in metric_args:
        if not isinstance(a, Node) or a.name not in _ROLLUP_AGGS:
            raise StreamExprError(f"rollup metric must be one of {_ROLLUP_AGGS}")
        col = a.args[0] if a.args else "*"
        if a.name == "per":
            if len(a.args) != 2:
                raise StreamExprError("per(col, percentile) expects two arguments")
            pct = float(a.args[1])
            metrics.append(("per", col, f"per({col},{a.args[1]})", pct))
        else:
            metrics.append((a.name, col, f"{a.name}({col})", None))

    if any(f in ("per", "countDist") for f, _, _, _ in metrics):
        return _rollup_exact(ds, over, metrics)
    metrics = [(f, c, n) for f, c, n, _ in metrics]

    def partial(df: pd.DataFrame) -> pa.Table:
        gb = df.groupby(over, dropna=False, sort=False)
        out = {}
        for func, col, nm in metrics:
            if func == "count":
                out[nm + "__n"] = gb.size()
            elif func == "avg":
                out[nm + "__s"] = gb[col].sum(min_count=1)
                out[nm + "__n"] = gb[col].count()
            elif func == "sum":
                out[nm + "__s"] = gb[col].sum(min_count=1)
            elif func == "std":
                out[nm + "__s"] = gb[col].sum(min_count=1)
                out[nm + "__q"] = gb[col].apply(lambda s: float((s.to_numpy() ** 2).sum()))
                out[nm + "__n"] = gb[col].count()
            else:
                out[nm + "__m"] = getattr(gb[col], func)()
        return pa.Table.from_pandas(pd.DataFrame(out).reset_index(), preserve_index=False)

    fns = []
    sum_cols: list[str] = []
    min_cols: list[str] = []
    max_cols: list[str] = []
    for func, col, nm in metrics:
        if func == "count":
            fns.append(Sum(nm + "__n", alias_name=nm + "__n"))
            sum_cols.append(nm + "__n")
        elif func == "avg":
            fns.append(Sum(nm + "__s", alias_name=nm + "__s"))
            fns.append(Sum(nm + "__n", alias_name=nm + "__n"))
            sum_cols += [nm + "__s", nm + "__n"]
        elif func == "std":
            fns.append(Sum(nm + "__s", alias_name=nm + "__s"))
            fns.append(Sum(nm + "__q", alias_name=nm + "__q"))
            fns.append(Sum(nm + "__n", alias_name=nm + "__n"))
            sum_cols += [nm + "__s", nm + "__q", nm + "__n"]
        elif func == "sum":
            fns.append(Sum(nm + "__s", alias_name=nm + "__s"))
            sum_cols.append(nm + "__s")
        elif func == "min":
            fns.append(Min(nm + "__m", alias_name=nm + "__m"))
            min_cols.append(nm + "__m")
        else:
            fns.append(Max(nm + "__m", alias_name=nm + "__m"))
            max_cols.append(nm + "__m")
    from apache___solr_ray.pipelines.common import combine_partials

    agg = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        over, fns, sum_cols, min_cols, max_cols,
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in over}
        for func, col, nm in metrics:
            if func == "count":
                cols[nm] = t.column(nm + "__n").cast(pa.int64())
            elif func == "avg":
                cols[nm] = pc.divide(
                    pc.cast(t.column(nm + "__s"), pa.float64()),
                    pc.cast(t.column(nm + "__n"), pa.float64()),
                )
            elif func == "std":
                s = t.column(nm + "__s").to_numpy(zero_copy_only=False)
                qq = t.column(nm + "__q").to_numpy(zero_copy_only=False)
                n = t.column(nm + "__n").to_numpy(zero_copy_only=False).astype(np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    v = (qq - s * s / n) / np.maximum(n - 1, 1)
                    sd = np.sqrt(np.maximum(v, 0.0))
                cols[nm] = pa.array(np.where(n > 1, sd, np.nan))
            elif func == "sum":
                cols[nm] = t.column(nm + "__s")
            else:
                cols[nm] = t.column(nm + "__m")
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def _rollup_exact(ds, over: list[str], metrics: list):
    """Whole-group rollup plan for per()/countDist() (+ any companions):
    ONE key-hash co-location, exact pandas kernels over entire groups."""
    from apache___solr_ray.pipelines.common import grouped_map

    def whole(df: pd.DataFrame) -> pd.DataFrame:
        gb = df.groupby(over, dropna=False, sort=False)
        out = {}
        for func, col, nm, extra in metrics:
            if func == "count":
                out[nm] = gb.size()
            elif func == "avg":
                out[nm] = gb[col].mean()
            elif func == "std":
                out[nm] = gb[col].std(ddof=1)
            elif func == "countDist":
                out[nm] = gb[col].nunique()
            elif func == "per":
                out[nm] = gb[col].quantile(extra / 100.0, interpolation="linear")
            else:
                out[nm] = getattr(gb[col], func)()
        return pd.DataFrame(out).reset_index()

    return grouped_map(ds, over, whole)


def _join_keys(node: Node):
    on = node.params.get("on")
    if not on:
        raise StreamExprError("join needs on=")
    lk, rk = [], []
    for part in on.split(","):
        part = part.strip()
        if "=" in part:
            a, b = part.split("=", 1)
            lk.append(a.strip())
            rk.append(b.strip())
        else:
            lk.append(part)
            rk.append(part)
    return lk, rk


def _cogroup_join(lds, rds, lk, rk, how: str):
    """ONE key-hash co-location of both sides (grouped_map over the tagged
    union), vectorized pandas merge per partition. Assumes all rows of a
    key fit one partition (salt hot keys otherwise). Shared implementation
    in ``pipelines.common.cogroup_join`` (it doubles as the race-free
    fallback plan for Ray's native Dataset.join)."""
    from apache___solr_ray.pipelines.common import cogroup_join

    return cogroup_join(lds, rds, lk, rk, how)


def _op_inner_join(node: Node, sf_dir: str):
    if len(node.args) < 2:
        raise StreamExprError("join needs two inner streams")
    lds, _ = _compile(node.args[0], sf_dir)
    rds, _ = _compile(node.args[1], sf_dir)
    lk, rk = _join_keys(node)
    return _cogroup_join(lds, rds, lk, rk, "inner"), None


def _op_left_join(node: Node, sf_dir: str):
    if len(node.args) < 2:
        raise StreamExprError("join needs two inner streams")
    lds, _ = _compile(node.args[0], sf_dir)
    rds, _ = _compile(node.args[1], sf_dir)
    lk, rk = _join_keys(node)
    return _cogroup_join(lds, rds, lk, rk, "left"), None


def _op_full_join(node: Node, sf_dir: str):
    """FullOuterJoinStream / OuterHashJoinStream (reference
    ``FullOuterJoinStream.java``, ``OuterHashJoinStream.java``): unmatched
    rows of BOTH sides survive with the other side's fields NULL; the key
    field is the coalesced value under the left key's name (the reference
    merges both tuples into one). Same single co-location shuffle as
    innerJoin — no driver materialization."""
    if len(node.args) < 2:
        raise StreamExprError("join needs two inner streams")
    lds, _ = _compile(node.args[0], sf_dir)
    rds, _ = _compile(node.args[1], sf_dir)
    lk, rk = _join_keys(node)
    return _cogroup_join(lds, rds, lk, rk, "full"), None


#: hashJoin/fetch read their build side fully (HashJoinStream.java opens
#: the hashed stream into memory; FetchStream point-looks-up) — guard the
#: contract instead of silently degrading
HASHED_SIDE_MAX = 5_000_000


def _broadcast_join_stream(lds, rds, lk, rk, how: str):
    """Build side collected ONCE and broadcast (ray.put); every probe batch
    does one vectorized pandas merge — no shuffle. This is the reference's
    own hashJoin/fetch memory model; sides above HASHED_SIDE_MAX rows must
    use innerJoin/leftOuterJoin (the distributed cogroup) instead."""
    import ray

    # size-check BEFORE collecting to the driver: materialize keeps the
    # blocks in the object store, count() then reads metadata only, and
    # to_pandas() runs only on a side that already passed the guard
    rds = rds.materialize()
    n = rds.count()
    if n > HASHED_SIDE_MAX:
        raise StreamExprError(
            f"hashed/fetch side has {n} rows (> {HASHED_SIDE_MAX}); "
            "use innerJoin/leftOuterJoin for big-big joins"
        )
    rt = rds.to_pandas()
    ref = ray.put(rt)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        out = df.merge(
            r,
            left_on=lk,
            right_on=rk,
            how=("left" if how == "left" else "inner"),
            suffixes=("", "__r"),
        )
        drop = [k for k in rk if k not in lk and k in out.columns]
        out = out.drop(columns=drop)
        # a batch whose rows ALL miss turns a string build-side column into
        # float64 NaN — restore object dtype with real nulls so the Arrow
        # block stays a (nullable) string column
        for c in r.columns:
            if c in out.columns and r[c].dtype == object:
                out[c] = out[c].astype(object).where(out[c].notna(), None)
        return out

    return lds.map_batches(probe, batch_format="pandas")


def _op_hash_join(node: Node, sf_dir: str, how: str = "inner"):
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("hashJoin needs an inner stream")
    hashed = node.params.get("hashed")
    if not isinstance(hashed, Node):
        raise StreamExprError("hashJoin needs hashed=<stream>")
    lds, _ = _compile(node.args[0], sf_dir)
    rds, _ = _compile(hashed, sf_dir)
    lk, rk = _join_keys(node)
    return _broadcast_join_stream(lds, rds, lk, rk, how), None


def _op_outer_hash_join(node: Node, sf_dir: str):
    """OuterHashJoinStream (reference ``OuterHashJoinStream.java``): LEFT
    outer hash join — every stream tuple survives, hashed-side fields NULL
    when unmatched. Same broadcast build side + guard as hashJoin()."""
    return _op_hash_join(node, sf_dir, how="left")


def _op_unique(node: Node, sf_dir: str):
    from apache___solr_ray.pipelines.common import grouped_map

    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("unique() needs an inner stream")
    ds, sort = _compile(node.args[0], sf_dir)
    over = [c.strip() for c in node.params.get("over", "").split(",") if c.strip()]
    if not over:
        raise StreamExprError("unique() requires over=")
    if not sort:
        raise StreamExprError(
            "unique() requires the inner stream to declare sort= (UniqueStream "
            "keeps the FIRST tuple per key in stream order)"
        )
    scols = [c for c, _ in sort]
    sasc = [not d for _, d in sort]

    def first_per_key(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(scols, ascending=sasc, kind="mergesort")
            .drop_duplicates(over)
        )

    return grouped_map(ds, over, first_per_key), sort


def _op_top(node: Node, sf_dir: str):
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("top() needs an inner stream")
    ds, _ = _compile(node.args[0], sf_dir)
    n = int(node.params.get("n", "10"))
    sort = _parse_sort(node.params.get("sort", ""))
    if not sort:
        raise StreamExprError("top() requires sort=")
    out = ds.sort([c for c, _ in sort], descending=[d for _, d in sort]).limit(n)
    return out, sort


_CMP = {
    "eq": pc.equal, "gt": pc.greater, "lt": pc.less,
    "gteq": pc.greater_equal, "lteq": pc.less_equal,
}


def _pred(node: Node, t: pa.Table):
    if node.name in _CMP:
        ref = node.args[0]
        if isinstance(ref, Node):  # e.g. gt(count(*), 30) over a rollup
            arg = ref.args[0] if ref.args else "*"
            ref = f"{ref.name}({arg})"
        col = t.column(ref)
        raw = node.args[1]
        try:
            val: object = float(raw) if "." in str(raw) else int(raw)
        except (TypeError, ValueError):
            val = raw
        return _CMP[node.name](col, pa.scalar(val))
    if node.name == "and":
        out = _pred(node.args[0], t)
        for a in node.args[1:]:
            out = pc.and_kleene(out, _pred(a, t))
        return out
    if node.name == "or":
        out = _pred(node.args[0], t)
        for a in node.args[1:]:
            out = pc.or_kleene(out, _pred(a, t))
        return out
    if node.name == "not":
        return pc.invert(_pred(node.args[0], t))
    raise StreamExprError(f"unknown boolean operand {node.name!r}")


def _op_having(node: Node, sf_dir: str):
    if len(node.args) < 2 or not isinstance(node.args[0], Node) or not isinstance(node.args[1], Node):
        raise StreamExprError("having(stream, booleanOp) expected")
    ds, sort = _compile(node.args[0], sf_dir)
    cond = node.args[1]

    def flt(t: pa.Table, _c=cond) -> pa.Table:
        return t.filter(_pred(_c, t))

    return ds.map_batches(flt, batch_format="pyarrow"), sort


def _op_sort(node: Node, sf_dir: str):
    """SortStream: full re-sort of the incoming stream by ``by=``."""
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("sort() needs an inner stream")
    ds, _ = _compile(node.args[0], sf_dir)
    sort = _parse_sort(node.params.get("by", ""))
    if not sort:
        raise StreamExprError("sort() requires by=")
    return ds.sort([c for c, _ in sort], descending=[d for _, d in sort]), sort


def _op_merge(node: Node, sf_dir: str):
    """MergeStream: union of streams merged into the ``on=`` order (the
    reference interleaves two already-sorted streams; union + one sort is
    the Ray Data equivalent with identical output order)."""
    streams = [a for a in node.args if isinstance(a, Node)]
    if len(streams) < 2:
        raise StreamExprError("merge() needs at least two inner streams")
    sort = _parse_sort(node.params.get("on", ""))
    if not sort:
        raise StreamExprError("merge() requires on=")
    ds, _ = _compile(streams[0], sf_dir)
    for s in streams[1:]:
        other, _ = _compile(s, sf_dir)
        ds = ds.union(other)
    return ds.sort([c for c, _ in sort], descending=[d for _, d in sort]), sort


def _op_fetch(node: Node, sf_dir: str):
    """FetchStream: enrich stream tuples with fields from another
    collection by key (batched point lookups in the reference — the lookup
    side is broadcast once, left-outer so unmatched tuples pass through
    unenriched, exactly FetchStream's semantics)."""
    from apache___solr_ray.sources import load

    if len(node.args) < 2 or isinstance(node.args[0], Node) or not isinstance(node.args[1], Node):
        raise StreamExprError("fetch(collection, stream, on=..., fl=...) expected")
    table = node.args[0]
    ds, sort = _compile(node.args[1], sf_dir)
    lk, rk = _join_keys(node)
    fl = [c.strip() for c in node.params.get("fl", "").split(",") if c.strip()]
    if not fl:
        raise StreamExprError("fetch() requires fl= (fields to pull)")
    right = load(sf_dir, table, columns=sorted(set(fl) | set(rk)))
    return _broadcast_join_stream(ds, right, lk, rk, "left"), sort


def _op_set(node: Node, sf_dir: str, keep: bool):
    """IntersectStream / ComplementStream: keep left tuples whose on= key
    does (intersect) / does not (complement) appear in the right stream.
    The right side reduces to its DISTINCT keys before leaving the cluster
    (one groupby), then broadcasts under the same size guard as hashJoin —
    the reference reads both streams on one node too."""
    if len(node.args) < 2 or not isinstance(node.args[0], Node) or not isinstance(node.args[1], Node):
        raise StreamExprError(f"{node.name}(left, right, on=...) expected")
    lds, sort = _compile(node.args[0], sf_dir)
    rds, _ = _compile(node.args[1], sf_dir)
    lk, rk = _join_keys(node)
    if len(lk) != 1:
        raise StreamExprError(f"{node.name}() supports a single on= key")
    # distinct keys only — bounded by key cardinality; size-check via
    # metadata BEFORE pulling the key table onto the driver
    keys_ds = rds.groupby(rk[0]).count().materialize()
    n = keys_ds.count()
    if n > HASHED_SIDE_MAX:
        raise StreamExprError(
            f"{node.name}() right side has {n} distinct keys "
            f"(> {HASHED_SIDE_MAX}); pre-filter it"
        )
    keys_tbl = keys_ds.to_pandas()
    # vectorized membership: pc.is_in hash-probe in C (common.semi_join_filter)
    from apache___solr_ray.pipelines.common import semi_join_filter

    return semi_join_filter(lds, lk[0], keys_tbl[rk[0]].tolist(), keep=keep), sort


def _metric_nodes(node: Node):
    ms = [a for a in node.args if isinstance(a, Node) and a.name in _ROLLUP_AGGS]
    if not ms:
        raise StreamExprError(f"{node.name}() needs at least one metric")
    return ms


def _rollup_over(ds, over: list[str], metric_nodes: list[Node]):
    """Shared rollup entry for facet()/stats()/timeseries()."""
    return _rollup_core(ds, over, metric_nodes)


def _op_facet(node: Node, sf_dir: str):
    """FacetStream (facet(collection, q=, buckets=, bucketSorts=,
    bucketSizeLimit=, metrics...)): pushdown-style facet = rollup over the
    bucket fields + bucket sort + limit. Ties in the sort break by the
    bucket value ascending (Solr's index-order tie-break)."""
    from apache___solr_ray.sources import load

    if not node.args or isinstance(node.args[0], Node):
        raise StreamExprError("facet(collection, ...) expected")
    table = node.args[0]
    buckets = [c.strip() for c in node.params.get("buckets", "").split(",") if c.strip()]
    if not buckets:
        raise StreamExprError("facet() requires buckets=")
    metrics = _metric_nodes(node)
    cols = set(buckets)
    for m in metrics:
        if m.args and m.args[0] != "*":
            cols.add(m.args[0])
    qs = node.params.get("q", "*:*")
    flt, qfield = _q_filter(qs)
    if qfield:
        cols.add(qfield)
    ds = load(sf_dir, table, columns=sorted(cols))
    if flt is not None:
        ds = ds.map_batches(flt, batch_format="pyarrow")
    out = _rollup_over(ds, buckets, metrics)
    sorts = _parse_sort(node.params.get("bucketSorts", f"{buckets[0]} asc"))
    keys = [c for c, _ in sorts] + [b for b in buckets if b not in {c for c, _ in sorts}]
    desc = [d for _, d in sorts] + [False] * (len(keys) - len(sorts))
    out = out.sort(keys, descending=desc)
    lim = node.params.get("bucketSizeLimit")
    if lim is not None:
        out = out.limit(int(lim))
    return out, sorts


def _op_stats(node: Node, sf_dir: str):
    """StatsStream: global (ungrouped) metrics over a query's matches."""
    from apache___solr_ray.sources import load

    if not node.args or isinstance(node.args[0], Node):
        raise StreamExprError("stats(collection, ...) expected")
    table = node.args[0]
    metrics = _metric_nodes(node)
    cols = set()
    for m in metrics:
        if m.args and m.args[0] != "*":
            cols.add(m.args[0])
    qs = node.params.get("q", "*:*")
    flt, qfield = _q_filter(qs)
    if qfield:
        cols.add(qfield)
    if not cols:
        raise StreamExprError("stats() with only count(*) needs q= on a real field")
    ds = load(sf_dir, table, columns=sorted(cols))
    if flt is not None:
        ds = ds.map_batches(flt, batch_format="pyarrow")

    def add_g(t: pa.Table) -> pa.Table:
        return t.append_column("__g", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    out = _rollup_over(ds.map_batches(add_g, batch_format="pyarrow"), ["__g"], metrics)
    return out.map_batches(
        lambda t: t.drop_columns(["__g"]), batch_format="pyarrow"
    ), None


_GAPS = {"+1DAY": "day", "+1HOUR": "hour", "+1MINUTE": "minute"}


def _op_timeseries(node: Node, sf_dir: str):
    """TimeSeriesStream: metrics per date bucket (gap subset: +1DAY /
    +1HOUR / +1MINUTE → temporal floor), bucket column keeps the field
    name, ordered by bucket ascending."""
    from apache___solr_ray.sources import load

    if not node.args or isinstance(node.args[0], Node):
        raise StreamExprError("timeseries(collection, ...) expected")
    table = node.args[0]
    field = node.params.get("field")
    gap = node.params.get("gap", "+1DAY")
    if not field:
        raise StreamExprError("timeseries() requires field=")
    if gap not in _GAPS:
        raise StreamExprError(f"unsupported gap {gap!r} (one of {sorted(_GAPS)})")
    unit = _GAPS[gap]
    metrics = _metric_nodes(node)
    cols = {field}
    for m in metrics:
        if m.args and m.args[0] != "*":
            cols.add(m.args[0])
    qs = node.params.get("q", "*:*")
    flt, qfield = _q_filter(qs)
    if qfield:
        cols.add(qfield)
    ds = load(sf_dir, table, columns=sorted(cols))
    if flt is not None:
        ds = ds.map_batches(flt, batch_format="pyarrow")

    def trunc(t: pa.Table, _f=field, _u=unit) -> pa.Table:
        i = t.schema.get_field_index(_f)
        return t.set_column(i, _f, pc.floor_temporal(t.column(_f), unit=_u))

    out = _rollup_over(ds.map_batches(trunc, batch_format="pyarrow"), [field], metrics)
    return out.sort([field]), [(field, False)]


def _op_intersect(node: Node, sf_dir: str):
    return _op_set(node, sf_dir, keep=True)


def _op_complement(node: Node, sf_dir: str):
    return _op_set(node, sf_dir, keep=False)


def _op_cartesian(node: Node, sf_dir: str):
    """CartesianProductStream (reference ``CartesianProductStream.java``):
    one output tuple per element of a multivalued (list) field, all other
    fields repeated — the explode/unnest shape, fully vectorized (list
    lengths -> np.repeat take indices; the flattened child array is the
    new column, zero-copy from the Arrow list buffer)."""
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("cartesianProduct() needs an inner stream")
    if len(node.args) < 2 or not isinstance(node.args[1], str):
        raise StreamExprError('cartesianProduct(stream, "field [as name]") expected')
    ds, _ = _compile(node.args[0], sf_dir)
    m = re.match(r"^(\w+)(?:\s+as\s+(\w+))?$", node.args[1].strip(), re.IGNORECASE)
    if not m:
        raise StreamExprError(f"bad cartesianProduct field {node.args[1]!r}")
    fld, out = m.group(1), m.group(2) or m.group(1)

    def explode(t: pa.Table, _f=fld, _o=out) -> pa.Table:
        if _f not in t.column_names:
            raise StreamExprError(f"cartesianProduct: no field {_f!r}")
        col = t.column(_f).combine_chunks()
        if not (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
            raise StreamExprError(f"cartesianProduct: {_f!r} is not multivalued")
        lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        lengths = np.where(np.isnan(lengths.astype(np.float64)), 0, lengths).astype(np.int64)
        idx = pa.array(np.repeat(np.arange(t.num_rows), lengths))
        cols = {n: t.column(n).take(idx) for n in t.column_names if n != _f}
        cols[_o] = col.flatten()
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow"), None


def _op_parallel(node: Node, sf_dir: str):
    """ParallelStream (reference ``ParallelStream.java:39-46``): Solr ships
    the inner expression to N workers, each reading its hash partition.
    Ray Data's streaming executor ALREADY executes every stage of the
    compiled inner pipeline data-parallel (the scan partitions into blocks;
    map_batches fans out; wide ops shuffle), so ``workers=N`` maps to the
    output partition count (``repartition(N)``) and the expression is
    otherwise structural. ``sort=`` declares the merge order exactly like
    the reference's worker-merge."""
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("parallel() needs an inner stream")
    ds, sort = _compile(node.args[0], sf_dir)
    workers = int(node.params.get("workers", "0") or 0)
    if workers > 0:
        ds = ds.repartition(workers)
    if "sort" in node.params:
        sort = _parse_sort(node.params["sort"])
        ds = ds.sort([c for c, _ in sort], descending=[d for _, d in sort])
    return ds, sort


#: let() vectors are bounded driver-side state (the reference evaluates
#: math expressions on one worker the same way) — col() refuses beyond this
LET_VECTOR_MAX = 10_000_000


class _LazyTuples:
    """A let()-bound stream exposed to the tuple-list evaluators (pivot/
    latlonVectors/termVectors — reference ``LetStream.java`` holds bound
    streams in memory as tuple lists). The Dataset's blocks stay in the
    object store until an evaluator actually asks for rows; collection is
    capped by LET_VECTOR_MAX like col()."""

    def __init__(self, mds, srt):
        self._mds, self._srt, self._rows = mds, srt, None

    def _as_tuples(self):
        if self._rows is None:
            n = self._mds.count()
            if n > LET_VECTOR_MAX:
                raise StreamExprError(
                    f"let() stream binding has {n} rows (> LET_VECTOR_MAX); "
                    "tuple-list evaluators are bounded in-memory state"
                )
            mds = self._mds
            if self._srt:
                mds = mds.sort(
                    [c for c, _ in self._srt], descending=[d for _, d in self._srt]
                )
            self._rows = mds.to_pandas().to_dict("records")
        return self._rows


def _bind_memset(v: Node, env: dict, sf_dir: str) -> dict:
    """MemsetEvaluator (reference ``io/eval/MemsetEvaluator.java:40-115``):
    read ONE stream, copy ``cols`` into vectors bound as ``vars`` (visible
    to the rest of the let() like any other variable); ``size`` truncates.
    Returns the var->vector map (the binding name itself holds the map)."""
    if not v.args or not isinstance(v.args[0], Node):
        raise StreamExprError("memset(stream, cols=, vars=) expected")
    cols = [c.strip() for c in v.params.get("cols", "").split(",") if c.strip()]
    vars_ = [c.strip() for c in v.params.get("vars", "").split(",") if c.strip()]
    if not cols or len(cols) != len(vars_):
        raise StreamExprError("memset: cols and vars lists must be the same size")
    mds, msort = _compile(v.args[0], sf_dir)
    if msort:
        mds = mds.sort([c for c, _ in msort], descending=[d for _, d in msort])
    mds = mds.select_columns(cols).materialize()
    n = mds.count()
    if n > LET_VECTOR_MAX:
        raise StreamExprError(f"memset: stream has {n} rows (> LET_VECTOR_MAX)")
    pdf = mds.to_pandas()
    if "size" in v.params:
        pdf = pdf.head(int(v.params["size"]))
    bound = {}
    for c, var in zip(cols, vars_):
        vec = pdf[c].to_numpy(dtype=np.float64)
        env[var] = vec
        bound[var] = vec
    return bound


def _make_col_fn(sf_dir: str):
    """col(stream, "field") resolver shared by let()/plot()/zplot().

    NOTE pairing determinism: a col() WITHOUT sort= collects in the
    executor's block-completion order, which is NOT guaranteed stable
    across runs. Order-insensitive evaluators (mean/percentile/
    describe/hist/ttest) are safe either way; PAIRING-sensitive ones
    (corr/cov/regress, and any vector result indexed by i) must draw
    every col() from a stream with a declared sort= (the reference's
    streams always carry a sort contract for the same reason)."""

    def col_fn(cnode: Node):
        if len(cnode.args) < 2 or not isinstance(cnode.args[0], Node) or not isinstance(cnode.args[1], str):
            raise StreamExprError('col(stream, "field") expected')
        cds, csort = _compile(cnode.args[0], sf_dir)
        if csort:
            cds = cds.sort([c for c, _ in csort], descending=[d for _, d in csort])
        fldname = cnode.args[1]
        cds = cds.select_columns([fldname]).materialize()
        n = cds.count()
        if n > LET_VECTOR_MAX:
            raise StreamExprError(
                f"col() vector has {n} rows (> LET_VECTOR_MAX={LET_VECTOR_MAX}); "
                "let() vectors are bounded in-memory state — aggregate upstream"
            )
        return cds.to_pandas()[fldname].to_numpy(dtype=np.float64)

    return col_fn


def _op_let(node: Node, sf_dir: str):
    """Math expressions (reference ``LetStream.java`` + the ``io/eval/``
    evaluator pack; guide ``math-expressions.adoc``): bind variables in
    declared order — ``col(stream, field)`` collects ONE column of a
    compiled (distributed) stream under LET_VECTOR_MAX — then evaluate the
    final expression via apache___solr_ray.mathexpr and emit the result as
    a tuple stream."""
    import ray

    from apache___solr_ray import mathexpr

    col_fn = _make_col_fn(sf_dir)
    env: dict = {}
    scope: dict = {}
    _LET_SCOPES.append(scope)
    _LET_ENVS.append(env)
    try:
        for k, v in node.params.items():
            if isinstance(v, Node) and v.name == "memset":
                env[k] = _bind_memset(v, env, sf_dir)
            elif (
                isinstance(v, Node)
                and v.name in _OPS
                and v.name not in set(mathexpr.EVALS) | {"tuple", "col"}
            ):
                # stream variable (LetStream binds TupleStreams too; the
                # reference holds the tuples in memory — materialize keeps
                # the blocks in the object store instead, and get() re-emits
                # them without recomputing; tuple-list evaluators see the
                # same binding lazily via _LazyTuples)
                ds, srt = _compile(v, sf_dir)
                mds = ds.materialize()
                scope[k] = (mds, srt)
                env[k] = _LazyTuples(mds, srt)
            elif isinstance(v, Node):
                env[k] = mathexpr.eval_node(v, env, col_fn)
            else:
                env[k] = float(v) if "." in str(v) else int(v)
        exprs = [a for a in node.args if isinstance(a, Node)]
        if len(exprs) != 1:
            raise StreamExprError("let() needs exactly one final expression")
        # names shared by the evaluator pack and the decorator set (tuple,
        # list, random, ...) keep their original math meaning inside let();
        # only pure stream decorators compile as the final stream
        _math_names = set(mathexpr.EVALS) | {"tuple", "col"}
        if exprs[0].name in _OPS and exprs[0].name not in _math_names:
            return _compile(exprs[0], sf_dir)
        try:
            res = mathexpr.eval_node(exprs[0], env, col_fn)
        except mathexpr.MathExprError as e:
            raise StreamExprError(str(e)) from None
        return ray.data.from_arrow(mathexpr.result_to_table(res)), None
    finally:
        _LET_SCOPES.pop()
        _LET_ENVS.pop()


#: let()-bound stream variables, innermost scope last (GetStream reads them)
_LET_SCOPES: list[dict] = []
#: let() variable environments, innermost last (plot()/zplot() read them)
_LET_ENVS: list[dict] = []


def _op_get(node: Node, sf_dir: str):
    """GetStream (reference ``GetStream.java``): re-emit a stream bound to
    a let() variable. The binding was materialized once at bind time, so
    repeated get()s stream the same object-store blocks."""
    if not node.args or not isinstance(node.args[0], str):
        raise StreamExprError("get(name) expected")
    name = node.args[0]
    for scope in reversed(_LET_SCOPES):
        if name in scope:
            return scope[name]
    raise StreamExprError(f"get(): no let() stream binding named {name!r}")


def _op_reduce(node: Node, sf_dir: str):
    """ReducerStream + GroupOperation (reference ``ReducerStream.java``,
    ``ops/GroupOperation.java``): tuples grouped by ``by=``; the
    group(sort=, n=) operation keeps the top-n tuples of each group in its
    declared order and the reducer emits the group head. (The reference's
    GroupOperation additionally nests the collected tuples as a list of
    maps; nested map columns don't fit the relational Arrow contract, so
    the head's scalar fields plus the collected-group size are emitted —
    the by=/sort=/n= semantics are the same.) Hash-partitioned by key, one
    vectorized pandas pass per partition."""
    from apache___solr_ray.pipelines.common import grouped_map

    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("reduce() needs an inner stream")
    by = [c.strip() for c in node.params.get("by", "").split(",") if c.strip()]
    if not by:
        raise StreamExprError("reduce() requires by=")
    gops = [
        a for a in node.args[1:] if isinstance(a, Node) and a.name in ("group", "distinct")
    ]
    if len(gops) != 1:
        raise StreamExprError(
            "reduce() needs one group(sort=, n=) or distinct() operation"
        )
    ds, inner_sort = _compile(node.args[0], sf_dir)
    if gops[0].name == "distinct":
        # DistinctOperation (reference ops/DistinctOperation.java): keep the
        # FIRST tuple per by-group in stream order — the inner stream's sort
        # contract, or the by-fields ascending when none is declared
        gsort = inner_sort or [(c, False) for c in by]
        n = 1
    else:
        gsort = _parse_sort(gops[0].params.get("sort", ""))
        if not gsort:
            raise StreamExprError("group() requires sort=")
        n = int(gops[0].params.get("n", "1"))

    def head_per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [c for c, _ in gsort], ascending=[not d for _, d in gsort]
        ).copy()
        df["groupSize"] = (
            df.groupby(by, sort=False)[by[0]].transform("size").clip(upper=n)
        )
        return df.groupby(by, sort=False).head(1)

    return grouped_map(ds, by, head_per_group), None


def _op_score_nodes(node: Node, sf_dir: str):
    """ScoreNodesStream (reference ``ScoreNodesStream.java``: fetches each
    node term's docFreq + the collection's numDocs from the terms
    component and emits nodeScore = count * idf). Here: one pre-aggregated
    groupby computes every node's docFreq in collection.field, numDocs is
    a metadata count, and idf uses the same BM25 form the reference's
    similarity exposes: log(1 + (N - df + 0.5) / (df + 0.5)). The node set
    is bounded frontier state (guarded) and broadcast into the df filter —
    the collection is never collected."""
    import math

    import ray

    from apache___solr_ray.sources import load

    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("scoreNodes() needs an inner node stream")
    table = node.params.get("collection")
    field = node.params.get("field")
    if not table or not field:
        raise StreamExprError("scoreNodes() requires collection= and field=")
    nds, _ = _compile(node.args[0], sf_dir)
    nds = nds.materialize()
    n_nodes = nds.count()
    if n_nodes > HASHED_SIDE_MAX:
        raise StreamExprError(
            f"scoreNodes(): node set has {n_nodes} rows (> {HASHED_SIDE_MAX})"
        )
    nodes_t = pa.concat_tables(
        [ray.get(b) for b in nds.to_arrow_refs()]
    ).combine_chunks()
    node_vals = nodes_t.column("node")

    ds = load(sf_dir, table, columns=[field])
    num_docs = ds.count()

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(field).cast(node_vals.type), value_set=node_vals))

    df_rows = (
        ds.map_batches(flt, batch_format="pyarrow").groupby(field).count().take_all()
    )
    dfs = {r[field]: r["count()"] for r in df_rows}
    nvals = node_vals.to_pylist()
    df_arr = [int(dfs.get(v, 0)) for v in nvals]
    score = [
        math.log(1.0 + (num_docs - d + 0.5) / (d + 0.5)) for d in df_arr
    ]
    out = pa.table(
        {
            "node": pa.array(nvals, node_vals.type),
            "docFreq": pa.array(df_arr, pa.int64()),
            "numDocs": pa.array([num_docs] * len(nvals), pa.int64()),
            "nodeScore": pa.array(score, pa.float64()),
        }
    )
    return ray.data.from_arrow(out), None


def _op_cat(node: Node, sf_dir: str):
    """CatStream (reference ``solr/core/.../handler/CatStream.java``): read
    local text files under a chroot as tuples (file, line_number, line).
    The reference roots paths at $SOLR_HOME/userfiles; here the chroot
    defaults to ``sf_dir`` and may be overridden with chroot= (tests point
    it at a tmp dir). Reading is Ray Data's parallel read_text; the file
    name and 1-based line number are attached per block."""
    import os

    import ray.data as rd

    if not node.args or not isinstance(node.args[0], str):
        raise StreamExprError('cat("rel/path[,rel/path...]") expected')
    chroot = node.params.get("chroot", sf_dir)
    max_lines = int(node.params.get("maxLines", "0") or 0)
    paths = []
    for rel in node.args[0].split(","):
        p = os.path.normpath(os.path.join(chroot, rel.strip()))
        if not p.startswith(os.path.normpath(chroot)):
            raise StreamExprError(f"cat(): path {rel!r} escapes the chroot")
        if not os.path.exists(p):
            raise StreamExprError(f"cat(): no such file {rel!r}")
        paths.append(p)

    parts = []
    for p in paths:
        ds = rd.read_text(p)
        rel = os.path.relpath(p, chroot)

        def attach(t: pa.Table, _f=rel) -> pa.Table:
            return pa.table(
                {
                    "file": pa.array([_f] * t.num_rows, pa.string()),
                    "line": t.column("text"),
                }
            )

        parts.append(ds.map_batches(attach, batch_format="pyarrow"))
    out = parts[0]
    for more in parts[1:]:
        out = out.union(more)
    if max_lines > 0:
        out = out.limit(max_lines)
    return out, None


def _op_daemon(node: Node, sf_dir: str):
    """DaemonStream (reference ``DaemonStream.java``): Solr wraps an inner
    stream and re-executes it on ``runInterval`` inside the /stream
    handler, queueing tuples. Scheduling is a DRIVER concern in a batch
    engine (cron / Ray Serve / the jobs CLI re-submit); the expression
    parses with the reference's required id= and compiles to ONE iteration
    of the inner stream — exactly what each daemon tick executes."""
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("daemon() needs an inner stream")
    if "id" not in node.params:
        raise StreamExprError("daemon() requires id= (reference contract)")
    return _compile(node.args[0], sf_dir)


def _op_list(node: Node, sf_dir: str):
    """ListStream (reference ``ListStream.java``): emit each inner stream's
    tuples in operand order. Ray Datasets union lazily and preserve operand
    block order, so this stays streaming."""
    streams = [a for a in node.args if isinstance(a, Node)]
    if not streams:
        raise StreamExprError("list() needs >= 1 inner streams")
    ds, _ = _compile(streams[0], sf_dir)
    for s in streams[1:]:
        nxt, _ = _compile(s, sf_dir)
        ds = ds.union(nxt)
    return ds, None


def _op_plist(node: Node, sf_dir: str):
    """ParallelListStream (``ParallelListStream.java``): same tuple contract
    as list(); the reference opens the operands concurrently. Ray's
    streaming executor already runs union branches concurrently, so the
    distinction (client-side socket scheduling) dissolves here."""
    return _op_list(node, sf_dir)


def _op_echo(node: Node, sf_dir: str):
    """EchoStream (``EchoStream.java``): one tuple {echo: text}."""
    if not node.args or not isinstance(node.args[0], str):
        raise StreamExprError('echo("text") expected')
    import ray

    return ray.data.from_arrow(pa.table({"echo": pa.array([node.args[0]])})), None


def _op_null(node: Node, sf_dir: str):
    """NullStream (``NullStream.java``): consume the inner stream, emit a
    single {nullCount: n} tuple — the reference's tool for timing a
    stream without shipping its tuples. count() executes the pipeline but
    never collects rows onto the driver."""
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("null() needs an inner stream")
    import ray

    ds, _ = _compile(node.args[0], sf_dir)
    n = ds.count()
    return ray.data.from_arrow(pa.table({"nullCount": pa.array([float(n)])})), None


def _op_tuple(node: Node, sf_dir: str):
    """TupStream (``TupStream.java``) at stream level: one tuple from
    literal key=value params (inside let() the same name is handled by
    eval_node, where values may be evaluator expressions)."""
    import ray

    if not node.params:
        raise StreamExprError("tuple() needs key=value params")
    cols = {}
    for k, v in node.params.items():
        if isinstance(v, Node):
            raise StreamExprError(
                "stream-level tuple() takes literals; use tuple() inside let() "
                "for computed fields"
            )
        try:
            cols[k] = pa.array([float(v) if "." in str(v) else int(v)])
        except ValueError:
            cols[k] = pa.array([str(v)])
    return ray.data.from_arrow(pa.table(cols)), None


def _op_calc(node: Node, sf_dir: str):
    """CalculatorStream (reference ``CalculatorStream.java:82-90``): emits
    exactly one tuple so select() can evaluate pure math with no collection
    scan. The placeholder field is dropped by select()'s projection."""
    import ray

    return ray.data.from_arrow(pa.table({"calc": pa.array([1])})), None


def _eval_viz_param(v, env, col_fn):
    """plot()/zplot() named-parameter resolver: evaluator expression,
    let()-bound variable name, or numeric/string literal (the reference's
    PlotStream.java:161-210 resolves params against the let context the
    same way)."""
    from apache___solr_ray import mathexpr

    if isinstance(v, Node):
        try:
            return mathexpr.eval_node(v, env, col_fn)
        except mathexpr.MathExprError as e:
            raise StreamExprError(str(e)) from None
    if isinstance(v, str):
        if v in env:
            return env[v]
        try:
            return float(v) if "." in v else int(v)
        except ValueError:
            return v
    return v


def _op_plot(node: Node, sf_dir: str):
    """PlotStream (reference ``PlotStream.java:161-210``): one tuple with
    ``plot`` = the plot type and ``data`` = the [x, y] pair list; when x=
    is omitted the reference numbers the points 1..n."""
    import ray

    env = _LET_ENVS[-1] if _LET_ENVS else {}
    col_fn = _make_col_fn(sf_dir)
    y = _eval_viz_param(node.params.get("y"), env, col_fn) if "y" in node.params else None
    if y is None:
        raise StreamExprError("plot() requires y= (a vector)")
    y = np.asarray(y, dtype=np.float64)
    if "x" in node.params:
        x = np.asarray(_eval_viz_param(node.params["x"], env, col_fn), dtype=np.float64)
    else:
        x = np.arange(1, len(y) + 1, dtype=np.float64)
    if len(x) != len(y):
        raise StreamExprError("plot(): x and y lengths differ")
    typ = str(node.params.get("type", "scatter"))
    data = pa.array([np.stack([x, y], axis=1).tolist()], pa.list_(pa.list_(pa.float64())))
    return ray.data.from_arrow(pa.table({"plot": pa.array([typ]), "data": data})), None


def _op_zplot(node: Node, sf_dir: str):
    """ZplotStream (reference ``ZplotStream.java:116-220``, vectors case):
    every named parameter evaluates to an equal-length vector; one tuple
    per index with the parameter names as fields. The table=/dist=/
    clusters=/heat= Zeppelin shapes are visualization-host plumbing and
    raise here."""
    import ray

    env = _LET_ENVS[-1] if _LET_ENVS else {}
    col_fn = _make_col_fn(sf_dir)
    cols = {}
    for name, v in node.params.items():
        if name in ("table", "dist", "clusters", "heat"):
            raise StreamExprError(f"zplot: {name}= is Zeppelin plumbing; pass vectors")
        vec = np.asarray(_eval_viz_param(v, env, col_fn), dtype=np.float64)
        if vec.ndim != 1:
            raise StreamExprError(f"zplot: {name}= must evaluate to a vector")
        cols[name] = vec
    if not cols:
        raise StreamExprError("zplot() needs >= 1 vector params")
    n = {len(v) for v in cols.values()}
    if len(n) != 1:
        raise StreamExprError("zplot: all vectors must have the same length")
    return ray.data.from_arrow(pa.table({k: pa.array(v) for k, v in cols.items()})), None


def _op_model(node: Node, sf_dir: str):
    """ModelStream (reference ``ModelStream.java``: fetch the latest stored
    model by id from a models collection). train()/textLogit() emits
    per-iteration model tuples and update() stores them as a collection;
    model(collection, id=...) reads that stored collection (falling back
    to an sf_dir table of the same name), filters to the requested model
    id when the column exists, and emits the highest-iteration tuples —
    the reference's 'latest cached model' contract."""
    import os

    import ray

    from apache___solr_ray.sources import load

    if not node.args or not isinstance(node.args[0], str):
        raise StreamExprError("model(collection, ...) expected")
    coll = node.args[0]
    stored = os.path.join(_STREAM_UPDATES_DIR, coll)
    if os.path.isdir(stored):
        ds = ray.data.read_parquet(stored)
    else:
        ds = load(sf_dir, coll)
    names = ds.schema().names
    mid = node.params.get("id")
    if mid is not None:
        for c in ("id_s", "id", "name_s", "name"):
            if c in names:
                ds = ds.map_batches(
                    lambda t, _c=c, _v=str(mid): t.filter(
                        pc.equal(pc.cast(t.column(_c), pa.string()), _v)
                    ),
                    batch_format="pyarrow",
                )
                break
    if "iteration" in names:
        last = ds.max("iteration")
        ds = ds.map_batches(
            lambda t, _it=last: t.filter(pc.equal(t.column("iteration"), _it)),
            batch_format="pyarrow",
        )
    return ds, None


def _attach_recnum(ds, sort):
    """RecNumEvaluator (reference ``io/eval/RecNumEvaluator.java``): the
    0-based record number in stream order. The stream's sort contract IS
    the order; after one Ray sort the materialized blocks are globally
    ordered, so per-block offsets come from block METADATA (num_rows —
    no block is read on the driver) and each block numbers itself in a
    task."""
    import ray

    sds = ds.sort([c for c, _ in sort], descending=[d for _, d in sort]).materialize()
    refs, counts = [], []
    for b in sds.iter_internal_ref_bundles():
        for ref, meta in b.blocks:
            nr = meta.num_rows
            if nr is None:  # pragma: no cover - materialized blocks carry counts
                nr = len(ray.get(ref))
            refs.append(ref)
            counts.append(int(nr))
    if not refs:
        return sds
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))

    @ray.remote
    def _add(tbl, off):
        return tbl.append_column(
            "recNum()", pa.array(np.arange(off, off + tbl.num_rows, dtype=np.int64))
        )

    return ray.data.from_arrow_refs(
        [_add.remote(r, int(o)) for r, o in zip(refs, offs)]
    )


def _op_random(node: Node, sf_dir: str):
    """RandomStream (``RandomStream.java:53-58``): pseudo-random rows of a
    query result. The reference seeds Lucene's random sort; this engine is
    DETERMINISTIC by contract, so membership/order come from the same Knuth
    multiplicative hash the sample_* pipelines use, applied to key= (an
    integer field; default first fl field): ORDER BY hash(key), key LIMIT
    rows — reproducible, map-side, and mirrored exactly by oracle SQL."""
    if not node.args or not isinstance(node.args[0], str):
        raise StreamExprError("random(collection, ...) expected")
    srch = Node("search", [node.args[0]], dict(node.params))
    srch.params.pop("rows", None)
    srch.params.pop("key", None)
    ds, _ = _compile(srch, sf_dir)
    fl = [c.strip() for c in node.params.get("fl", "").split(",") if c.strip()]
    key = node.params.get("key", fl[0] if fl else None)
    if not key:
        raise StreamExprError("random() needs key= or fl=")
    rows = int(node.params.get("rows", "10"))

    def add_hash(t: pa.Table, _k=key) -> pa.Table:
        ids = t.column(_k).to_numpy().astype(np.int64)
        h = ((ids % 1000003) * 2654435761 + 12345) % 1000000007
        return t.append_column("__rh", pa.array(h))

    ds = ds.map_batches(add_hash, batch_format="pyarrow")
    ds = ds.sort(["__rh", key]).limit(rows)
    ds = ds.map_batches(lambda t: t.drop_columns(["__rh"]), batch_format="pyarrow")
    return ds, None


_STREAM_UPDATES_DIR = "/tmp/apache___solr_ray_cache/stream_updates"


def _op_update(node: Node, sf_dir: str):
    """UpdateStream (``UpdateStream.java``): index the inner stream's tuples
    into a destination collection and emit {batchIndexed: n}. Collections in
    this engine are parquet directories; the write streams block-by-block
    via write_parquet (never collected on the driver) and the count comes
    from the written files' parquet metadata. Re-running replaces the
    destination (idempotent)."""
    import os
    import shutil

    import pyarrow.dataset as pads
    import ray

    if len(node.args) < 2 or not isinstance(node.args[0], str) or not isinstance(node.args[1], Node):
        raise StreamExprError("update(dest, innerStream) expected")
    dest = node.args[0]
    if not re.match(r"^\w+$", dest):
        raise StreamExprError(f"bad update() destination {dest!r}")
    ds, _ = _compile(node.args[1], sf_dir)
    outdir = os.path.join(_STREAM_UPDATES_DIR, dest)
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)
    ds.write_parquet(outdir)
    n = pads.dataset(outdir, format="parquet").count_rows()
    return ray.data.from_arrow(pa.table({"batchIndexed": pa.array([float(n)])})), None


def _op_delete(node: Node, sf_dir: str):
    """DeleteStream (reference ``DeleteStream.java``: sink deleting each
    inner tuple's uniqueKey from the destination). The indexed corpus's
    uniqueKey is ``url``; deletes are Lucene-semantics TOMBSTONES
    (``deletes.delete_by_url``) — matching stops immediately, stats change
    at the purging merge. Emits {totalDeleted: n} (newly tombstoned;
    missing keys are no-ops, as in Solr's deleteById)."""
    import ray

    from apache___solr_ray.deletes import delete_by_url
    from apache___solr_ray.pipelines.indexq import ensure_doc_index

    if len(node.args) < 2 or not isinstance(node.args[0], str) or not isinstance(node.args[1], Node):
        raise StreamExprError("delete(collection, innerStream) expected")
    if node.args[0] != "documents":
        raise StreamExprError("delete() targets the indexed corpus: collection must be 'documents'")
    ds, _ = _compile(node.args[1], sf_dir)
    ds = ds.materialize()
    n = ds.count()
    if n > HASHED_SIDE_MAX:
        raise StreamExprError(f"delete(): {n} keys (> {HASHED_SIDE_MAX})")
    cols = ds.schema().names
    if "url" not in cols:
        raise StreamExprError("delete() tuples need the uniqueKey field 'url'")
    urls = [r["url"] for r in ds.select_columns(["url"]).take_all()]
    deleted = delete_by_url(ensure_doc_index(sf_dir), urls)
    return ray.data.from_arrow(
        pa.table({"totalDeleted": pa.array([float(deleted)])})
    ), None


def _op_commit(node: Node, sf_dir: str):
    """CommitStream (``CommitStream.java``): wrap update(); after the child
    finishes, write the destination's commit manifest atomically
    (tmp + rename — same visibility rule as the index build) and pass the
    child's tuples through."""
    import json
    import os

    if len(node.args) < 2 or not isinstance(node.args[0], str) or not isinstance(node.args[1], Node):
        raise StreamExprError("commit(dest, update(...)) expected")
    dest, inner = node.args[0], node.args[1]
    if inner.name != "update":
        raise StreamExprError("commit() wraps an update() stream")
    ds, sort = _compile(inner, sf_dir)
    ds = ds.materialize()  # one tuple; forces the child's write to finish
    n = ds.to_pandas()["batchIndexed"].iloc[0]
    # manifest is a SIBLING of the collection dir so the destination stays a
    # pure parquet directory (readable by pads.dataset / load())
    outdir = os.path.join(_STREAM_UPDATES_DIR, dest)
    tmp = outdir + ".manifest.tmp"
    with open(tmp, "w") as f:
        json.dump({"collection": dest, "docs": n, "committed": True}, f)
    os.replace(tmp, outdir + ".commit_manifest.json")
    return ds, sort


def _op_nodes(node: Node, sf_dir: str):
    """GatherNodesStream (``GatherNodesStream.java``) — one breadth hop:
    nodes(collection, seedStream, walk="seedCol->edgeCol", gather="field")
    emits the DISTINCT gather-field values of collection rows whose edgeCol
    matches a seed tuple's seedCol. Nesting nodes(...) gives multi-hop.
    The hop itself is graph.py's adaptive frontier plan: small frontiers
    broadcast (ray.put + vectorized is_in), large ones hash semi-join."""
    from apache___solr_ray.pipelines.graph import _hop
    from apache___solr_ray.sources import load

    if len(node.args) < 2 or not isinstance(node.args[0], str) or not isinstance(node.args[1], Node):
        raise StreamExprError("nodes(collection, seedStream, ...) expected")
    walk = node.params.get("walk", "")
    m = re.match(r"^(\w+)->(\w+)$", walk)
    if not m:
        raise StreamExprError('nodes() needs walk="seedCol->edgeCol"')
    seed_col, edge_col = m.group(1), m.group(2)
    gather = node.params.get("gather")
    if not gather:
        raise StreamExprError("nodes() needs gather=")
    seeds, _ = _compile(node.args[1], sf_dir)

    def as_node(t: pa.Table, _c=seed_col) -> pa.Table:
        return pa.table({"node": t.column(_c).cast(pa.int64())})

    seeds = seeds.map_batches(as_node, batch_format="pyarrow")
    edges = load(sf_dir, node.args[0], columns=sorted({edge_col, gather}))
    out = _hop(edges, edge_col, gather, seeds)
    return out, None


def _op_knn_search(node: Node, sf_dir: str):
    """KnnStream (``KnnStream.java`` / the knn query parser): top-k nearest
    neighbours by cosine over an embedding collection. The reference passes
    a literal query vector; here id= addresses the query row (keeps the
    expression readable), k= the depth. Execution is the brute-force
    baseline: the query vector is broadcast once and each batch does one
    float64 matmul (similarity.py's per-batch pattern); the IVF/HNSW paths
    remain the scale route."""
    from apache___solr_ray.sources import load

    if not node.args or not isinstance(node.args[0], str):
        raise StreamExprError("knnSearch(collection, id=, k=) expected")
    coll = node.args[0]
    qid = int(node.params.get("id", "0"))
    k = int(node.params.get("k", "10"))
    ds = load(sf_dir, coll, columns=["vec_id", "embedding"])

    def pick(t: pa.Table, _q=qid) -> pa.Table:
        return t.filter(pc.equal(t.column("vec_id"), pa.scalar(_q)))

    qrow = ds.map_batches(pick, batch_format="pyarrow").take_all()
    if not qrow:
        raise StreamExprError(f"knnSearch: no row with vec_id={qid}")
    qv = np.asarray(qrow[0]["embedding"], dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    import ray as _ray

    qref = _ray.put(qv)

    def score(t: pa.Table, _qref=qref) -> pa.Table:
        q = _ray.get(_qref) if isinstance(_qref, _ray.ObjectRef) else _qref
        emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1)
        sims = emb @ q / np.where(norms == 0, 1.0, norms)
        return pa.table(
            {"vec_id": t.column("vec_id"), "score": pa.array(sims)}
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", "vec_id"], descending=[True, False]).limit(k), [
        ("score", True),
        ("vec_id", False),
    ]


def _op_sql(node: Node, sf_dir: str):
    """SqlStream (reference ``SqlStream.java``: ships stmt= to the /sql
    handler and streams the tuples back): forward stmt= to this repo's SQL
    front-end (``sql.py``, the Calcite-analog compiler) and stream its lazy
    Dataset. The optional positional collection name is accepted for
    reference syntax compatibility; the table comes from the statement."""
    stmt = node.params.get("stmt")
    if not isinstance(stmt, str) or not stmt.strip():
        raise StreamExprError('sql() requires stmt="SELECT ..."')
    from apache___solr_ray.sql import sql_query

    return sql_query(sf_dir, stmt), None


def _op_facet2d(node: Node, sf_dir: str):
    """Facet2DStream (reference ``Facet2DStream.java``): two-dimensional
    facet — the top ``nX`` x-buckets by total metric, and per surviving x
    the top ``nY`` y-buckets (``dimensions="nX,nY"``). Plan: one rollup
    over (x, y) (per-batch partials + one groupby — the bucket table is
    bounded by the dimension cardinalities), a small x-totals aggregate to
    pick the top-nX keys (collected under the dimensions bound, broadcast
    into the filter), then a per-x grouped top-nY."""
    from apache___solr_ray.pipelines.common import grouped_map
    from apache___solr_ray.sources import load

    if not node.args or isinstance(node.args[0], Node):
        raise StreamExprError("facet2D(collection, ...) expected")
    table = node.args[0]
    x = node.params.get("x")
    y = node.params.get("y")
    if not x or not y:
        raise StreamExprError("facet2D() requires x= and y=")
    dims = [int(d) for d in node.params.get("dimensions", "10,10").split(",")]
    if len(dims) != 2:
        raise StreamExprError('facet2D() dimensions must be "nX,nY"')
    n_x, n_y = dims
    metrics = _metric_nodes(node)
    if len(metrics) != 1:
        raise StreamExprError("facet2D() takes exactly one metric")
    mname = f"{metrics[0].name}({metrics[0].args[0] if metrics[0].args else '*'})"
    cols = {x, y}
    if metrics[0].args and metrics[0].args[0] != "*":
        cols.add(metrics[0].args[0])
    qs = node.params.get("q", "*:*")
    flt, qfield = _q_filter(qs)
    if qfield:
        cols.add(qfield)
    ds = load(sf_dir, table, columns=sorted(cols))
    if flt is not None:
        ds = ds.map_batches(flt, batch_format="pyarrow")
    r = _rollup_over(ds, [x, y], metrics)

    # top-nX x keys by total metric (desc, x asc tie-break) — a bounded
    # bucket list, collected once and pushed into a vectorized filter
    xt = (
        r.groupby(x)
        .sum(mname)
        .sort([f"sum({mname})", x], descending=[True, False])
        .limit(n_x)
    )
    keep_x = pa.array([row[x] for row in xt.take_all()])

    def flt_x(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(x), value_set=keep_x))

    def top_y(df: pd.DataFrame) -> pd.DataFrame:
        # the partition holds many whole x-groups: one vectorized sort,
        # then pandas' C groupby-head for the per-x cut
        df = df.sort_values([mname, y], ascending=[False, True])
        return df.groupby(x, sort=False).head(n_y)

    out = grouped_map(r.map_batches(flt_x, batch_format="pyarrow"), [x], top_y)
    return out, None


def _op_significant_terms(node: Node, sf_dir: str):
    """SignificantTermsStream (reference ``SignificantTermsStream.java:438``
    — per-shard foreground/background docFreq partials merged at the
    coordinator): one pass tokenizes each doc once and counts both the
    foreground (q-matching docs) and background df per term inside
    map_batches; ONE groupby merges the partials. Emits
    (term, foreground, background, score=fg/bg ratio rounded to 4), fg >=
    minDocFreq, top ``limit`` by score desc / term asc."""
    from ray.data.aggregate import Sum

    from apache___solr_ray.analyze import simple_tokenize
    from apache___solr_ray.sources import load

    if not node.args or isinstance(node.args[0], Node):
        raise StreamExprError("significantTerms(collection, ...) expected")
    table = node.args[0]
    field = node.params.get("field", "text")
    min_df = int(node.params.get("minDocFreq", "5"))
    limit = int(node.params.get("limit", "20"))
    qs = node.params.get("q", "*:*")
    qf = qv = None
    if qs != "*:*":
        m = re.match(r"^(\w+):(\S+)$", qs)
        if not m:
            raise StreamExprError("significantTerms() q must be field:value or *:*")
        qf, qv = m.group(1), m.group(2)
    cols = [field] + ([qf] if qf and qf != field else [])
    ds = load(sf_dir, table, columns=cols)

    def partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        if qf is not None:
            col = t.column(qf)
            val: object = qv
            if pa.types.is_integer(col.type):
                val = int(qv)
            elif pa.types.is_floating(col.type):
                val = float(qv)
            fg_mask = pc.equal(col, pa.scalar(val)).to_pylist()
        else:
            fg_mask = [True] * t.num_rows
        fg: Counter = Counter()
        bg: Counter = Counter()
        for i, txt in enumerate(t.column(field).to_pylist()):
            toks = set(simple_tokenize(txt or ""))
            bg.update(toks)
            if fg_mask[i]:
                fg.update(toks)
        terms = sorted(bg)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "fg_p": pa.array([fg.get(w, 0) for w in terms], pa.int64()),
                "bg_p": pa.array([bg[w] for w in terms], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("fg_p", alias_name="foreground"), Sum("bg_p", alias_name="background"))
    )

    def score(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t.column("foreground"), pa.scalar(min_df))
        t = t.filter(keep)
        ratio = pc.divide(
            pc.cast(t.column("foreground"), pa.float64()),
            pc.cast(t.column("background"), pa.float64()),
        )
        t = t.append_column("score", pc.round(ratio, 4))
        return t.select(["term", "foreground", "background", "score"])

    out = agg.map_batches(score, batch_format="pyarrow")
    out = out.sort(["score", "term"], descending=[True, False]).limit(limit)
    return out, [("score", True), ("term", False)]


def _resolve_cat_paths(node: Node, sf_dir: str) -> list[str]:
    """Shared chroot path resolution for cat()/csv()/tsv()."""
    import os

    if not node.args or not isinstance(node.args[0], str):
        raise StreamExprError(f'{node.name}("rel/path[,rel/path...]") expected')
    chroot = node.params.get("chroot", sf_dir)
    paths = []
    for rel in node.args[0].split(","):
        p = os.path.normpath(os.path.join(chroot, rel.strip()))
        if not p.startswith(os.path.normpath(chroot)):
            raise StreamExprError(f"{node.name}(): path {rel!r} escapes the chroot")
        if not os.path.exists(p):
            raise StreamExprError(f"{node.name}(): no such file {rel!r}")
        paths.append(p)
    return paths


def _op_csv(node: Node, sf_dir: str, delimiter: str = ","):
    """CsvStream / TsvStream (reference ``CsvStream.java``,
    ``TsvStream.java``: parse each file's first line as the header, every
    following line into a tuple). The reference wraps cat(); here the
    inner cat() node supplies the chroot-checked paths and the parse is
    Ray Data's parallel ``read_csv`` (header handling, quoting and
    row-group parallelism for free)."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    inner = node.args[0] if node.args and isinstance(node.args[0], Node) else None
    if inner is None or inner.name != "cat":
        raise StreamExprError(f"{node.name}(cat(...)) expected")
    paths = _resolve_cat_paths(inner, sf_dir)
    ds = rd.read_csv(paths, parse_options=pacsv.ParseOptions(delimiter=delimiter))
    return ds, None


def _op_tsv(node: Node, sf_dir: str):
    return _op_csv(node, sf_dir, delimiter="\t")


def _op_drill(node: Node, sf_dir: str):
    """DrillStream (reference ``DrillStream.java`` + the /export drill
    handler): ``drill(collection, q=, fl=, sort=, rollup(input(), ...))``
    runs the rollup expression over each shard's sorted export and
    re-aggregates at the coordinator. Ray Data's rollup already runs
    per-batch partials + one merge groupby — exactly the drill plan — so
    the inner expression compiles with ``input()`` bound to the scan."""
    if not node.args or isinstance(node.args[0], Node):
        raise StreamExprError("drill(collection, ..., <expr over input()>) expected")
    exprs = [a for a in node.args[1:] if isinstance(a, Node)]
    if len(exprs) != 1:
        raise StreamExprError("drill() needs exactly one inner expression")
    search = Node("search", [node.args[0]], dict(node.params))

    def bind(n: Node) -> Node:
        args = [
            search if (isinstance(a, Node) and a.name == "input")
            else (bind(a) if isinstance(a, Node) else a)
            for a in n.args
        ]
        params = {
            k: (bind(v) if isinstance(v, Node) and v.name != "input" else
                (search if isinstance(v, Node) else v))
            for k, v in n.params.items()
        }
        return Node(n.name, args, params)

    return _compile(bind(exprs[0]), sf_dir)


def _op_noop(node: Node, sf_dir: str):
    """NoOpStream (reference ``NoOpStream.java``): transparent wrapper."""
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("noop() needs an inner stream")
    return _compile(node.args[0], sf_dir)


def _op_eval(node: Node, sf_dir: str):
    """EvalStream (reference ``EvalStream.java``): read the FIRST tuple of
    the inner stream, take its ``expr_s`` field as a streaming expression,
    compile and emit THAT stream. (The reference uses it to run
    expressions stored in collections.)"""
    if not node.args or not isinstance(node.args[0], Node):
        raise StreamExprError("eval() needs an inner stream")
    ds, _ = _compile(node.args[0], sf_dir)
    rows = ds.limit(1).take_all()
    if not rows or "expr_s" not in rows[0]:
        raise StreamExprError("eval(): inner stream's first tuple needs an expr_s field")
    return _compile(parse_stream_expr(str(rows[0]["expr_s"])), sf_dir)


def _op_shortest_path(node: Node, sf_dir: str):
    """ShortestPathStream (reference ``ShortestPathStream.java``: iterative
    BFS from ``from=`` toward ``to=`` over ``edge="srcCol=dstCol"``,
    bounded by maxDepth=, emitting every shortest path as a tuple whose
    ``path`` field lists the nodes). Same memory model as the reference:
    the visited/parents map lives on the coordinator (bounded by the reach
    at maxDepth) while the EDGES stay a streamed, column-pruned Dataset
    scanned once per round with a broadcast vectorized is_in filter."""
    import ray

    from apache___solr_ray.sources import load

    if not node.args or isinstance(node.args[0], Node):
        raise StreamExprError("shortestPath(collection, ...) expected")
    m = re.match(r"^(\w+)\s*=\s*(\w+)$", node.params.get("edge", ""))
    if not m:
        raise StreamExprError('shortestPath() needs edge="srcCol=dstCol"')
    src_col, dst_col = m.group(1), m.group(2)
    if "from" not in node.params or "to" not in node.params:
        raise StreamExprError("shortestPath() needs from= and to=")
    start, goal = int(node.params["from"]), int(node.params["to"])
    max_depth = int(node.params.get("maxDepth", "4"))

    edges = load(sf_dir, node.args[0], columns=sorted({src_col, dst_col}))
    parents: dict[int, list[int]] = {start: []}
    frontier = np.array([start], dtype=np.int64)
    found_depth = None
    for depth in range(1, max_depth + 1):
        fref = ray.put(pa.array(frontier))

        def hop(t: pa.Table, _f=fref) -> pa.Table:
            fr = ray.get(_f)
            keep = t.filter(
                pc.is_in(t.column(src_col).cast(pa.int64()), value_set=fr)
            )
            return pa.table(
                {
                    "src": keep.column(src_col).cast(pa.int64()),
                    "dst": keep.column(dst_col).cast(pa.int64()),
                }
            )

        hops = edges.map_batches(hop, batch_format="pyarrow")
        pairs = (
            hops.groupby(["src", "dst"]).count().take_all()
        )  # distinct edges out of the frontier — bounded by the reach
        nxt: dict[int, list[int]] = {}
        for r in pairs:
            s, d = int(r["src"]), int(r["dst"])
            if d in parents:  # already reached at an earlier depth
                continue
            nxt.setdefault(d, []).append(s)
        if not nxt:
            break
        for d, ps in nxt.items():
            parents[d] = sorted(ps)
        if goal in nxt:
            found_depth = depth
            break
        frontier = np.fromiter(nxt.keys(), dtype=np.int64, count=len(nxt))
    if found_depth is None:
        return ray.data.from_arrow(
            pa.table({"path": pa.array([], pa.string())})
        ), None

    # enumerate every shortest path by walking the parent DAG backwards
    paths: list[list[int]] = []

    def walk(n: int, acc: list[int]):
        if n == start:
            paths.append([start] + list(reversed(acc)))
            return
        for p in parents[n]:
            walk(p, acc + [n])

    walk(goal, [])
    out = pa.table(
        {"path": pa.array(sorted("->".join(map(str, p)) for p in paths), pa.string())}
    )
    return ray.data.from_arrow(out), None


def _op_topic(node: Node, sf_dir: str):
    """TopicStream (reference ``TopicStream.java``: checkpointed pub/sub
    over an index — each open() resumes from the ``_version_`` checkpoint
    stored in the checkpoint collection and emits only NEW matches).
    ``topic(checkpoints, documents, q=, id=, rows=)``: the checkpoint lives
    in an atomic JSON sidecar keyed by id= (the checkpointCollection
    analog), the poll is ``IndexReader.topic_poll`` over the cached corpus
    index, and each compile = ONE daemon tick emitting the fresh doc
    tuples (at-least-once across a crash, exactly the reference's
    contract)."""
    import json
    import os

    import ray

    from apache___solr_ray.pipelines.indexq import ensure_doc_index
    from apache___solr_ray.query import IndexReader

    if len(node.args) < 2:
        raise StreamExprError("topic(checkpointCollection, collection, ...) expected")
    if node.args[1] != "documents":
        raise StreamExprError("topic() polls the indexed corpus: collection must be 'documents'")
    tid = node.params.get("id")
    if not tid or not re.match(r"^[\w.-]+$", tid):
        raise StreamExprError("topic() requires a filesystem-safe id=")
    qs = node.params.get("q")
    if not qs:
        raise StreamExprError("topic() requires q=")
    rows = int(node.params.get("rows", "500"))

    reader = IndexReader(ensure_doc_index(sf_dir))
    ckpt_dir = os.path.join("/tmp/apache___solr_ray_cache", "topics")
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt_path = os.path.join(ckpt_dir, f"{node.args[0]}__{tid}.json")
    ckpt = -1
    if os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            ckpt = int(json.load(f)["checkpoint"])
    fresh, new_ckpt = reader.topic_poll(qs.replace("text:", ""), checkpoint=ckpt, limit=rows)
    tmp = ckpt_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"checkpoint": new_ckpt, "id": tid, "q": qs}, f)
    os.replace(tmp, ckpt_path)  # atomic commit AFTER the emit set is fixed
    out = pa.table(
        {
            "doc_id": pa.array(fresh.astype(np.int64)),
            "url": pa.array(reader.urls_for(fresh), pa.string()),
        }
    )
    return ray.data.from_arrow(out), [("doc_id", False)]


def _op_priority(node: Node, sf_dir: str):
    """PriorityStream (reference ``PriorityStream.java``: wraps two topics;
    the high-priority topic is read first and the low-priority one is
    opened ONLY when the high-priority tick emits nothing — a two-level
    task queue). Compiling lazily preserves the reference's checkpoint
    contract: an unopened topic() never advances its checkpoint."""
    inner = [a for a in node.args if isinstance(a, Node)]
    if len(inner) != 2:
        raise StreamExprError("priority(highPriorityTopic, lowPriorityTopic) expected")
    for s in inner:
        if s.name != "topic":
            raise StreamExprError("priority() operands must be topic() streams")
    hi, hi_sort = _compile(inner[0], sf_dir)
    if hi.count() > 0:
        return hi, hi_sort
    return _compile(inner[1], sf_dir)


#: executor() task-count guard: a tick that dequeues more than this many
#: stored expressions is a runaway queue, not a tick
EXECUTOR_TASK_MAX = 10_000


def _op_executor(node: Node, sf_dir: str):
    """ExecutorStream (reference ``ExecutorStream.java``: reads tuples each
    carrying a streaming expression in ``expr_s``, executes each to
    completion for its side effects and discards its tuples — the worker
    end of a topic()-fed job queue). Each compile = one tick: the inner
    stream's task tuples are drained (count-guarded — task queues are
    small; the WORK runs distributed), each ``expr_s`` compiles through
    this same factory and is consumed via count() (never collected), and
    the emitted tuples report completion order."""
    import ray

    inner = [a for a in node.args if isinstance(a, Node)]
    if len(inner) != 1:
        raise StreamExprError("executor(stream) expects one inner stream")
    tasks_ds, _ = _compile(inner[0], sf_dir)
    n = tasks_ds.count()
    if n > EXECUTOR_TASK_MAX:
        raise StreamExprError(
            f"executor(): {n} queued tasks exceeds EXECUTOR_TASK_MAX "
            f"({EXECUTOR_TASK_MAX}) — drain the queue in smaller ticks"
        )
    tasks = tasks_ds.to_pandas()
    if "expr_s" not in tasks.columns:
        raise StreamExprError("executor(): inner tuples must carry expr_s")
    ids, exprs, counts = [], [], []
    for i, row in tasks.iterrows():
        expr = str(row["expr_s"])
        ds, _s = _compile(parse_stream_expr(expr), sf_dir)
        counts.append(float(ds.count()))  # execute fully; tuples discarded
        ids.append(str(row["id"]) if "id" in tasks.columns else str(i))
        exprs.append(expr)
    out = pa.table(
        {
            "id": pa.array(ids, pa.string()),
            "expr_s": pa.array(exprs, pa.string()),
            "tupleCount": pa.array(counts, pa.float64()),
        }
    )
    return ray.data.from_arrow(out), None


def _op_features_selection(node: Node, sf_dir: str):
    """FeaturesSelectionStream (reference ``FeaturesSelectionStream.java``):
    information-gain-scored top terms of ``field=`` against the binary
    outcome ``outcome= == positiveLabel=``. Emits (term, score, idx). The
    term/class partials, merge groupby and IG scoring run distributed in
    ``textml.features_selection``; only the top numTerms rows reach the
    driver."""
    import ray

    from apache___solr_ray.sources import load
    from apache___solr_ray.textml import features_selection

    if not node.args or isinstance(node.args[0], Node):
        raise StreamExprError("featuresSelection(collection, ...) expected")
    field = node.params.get("field")
    outcome = node.params.get("outcome")
    if not field or not outcome:
        raise StreamExprError("featuresSelection() requires field= and outcome=")
    positive = node.params.get("positiveLabel", "1")
    num_terms = int(node.params.get("numTerms", "20"))
    cols = sorted({field, outcome})
    qs = node.params.get("q", "*:*")
    flt, qfield = _q_filter(qs)
    if qfield:
        cols = sorted(set(cols) | {qfield})
    ds = load(sf_dir, node.args[0], columns=cols)
    if flt is not None:
        ds = ds.map_batches(flt, batch_format="pyarrow")
    return ray.data.from_arrow(
        features_selection(ds, field, outcome, positive, num_terms)
    ), [("idx", False)]


def _op_text_logit(node: Node, sf_dir: str):
    """TextLogitStream (reference ``TextLogitStream.java``: iterative
    logistic regression — every shard computes the logistic-loss gradient
    of its documents against the broadcast weights, the coordinator sums
    and updates, repeat maxIterations). Feature terms come from an inner
    featuresSelection(...) stream (or terms=). Emits one row per feature
    (term, weight) plus the ``__bias__`` row, each carrying the final
    trainError and iteration count."""
    import ray

    from apache___solr_ray.sources import load
    from apache___solr_ray.textml import text_logit

    if not node.args or isinstance(node.args[0], Node):
        raise StreamExprError("textLogit(collection, ...) expected")
    field = node.params.get("field")
    outcome = node.params.get("outcome")
    if not field or not outcome:
        raise StreamExprError("textLogit() requires field= and outcome=")
    positive = node.params.get("positiveLabel", "1")
    iters = int(node.params.get("maxIterations", "25"))
    lr = float(node.params.get("learningRate", "1.0"))
    inner = [a for a in node.args[1:] if isinstance(a, Node)]
    if "terms" in node.params:
        terms = [w.strip() for w in node.params["terms"].split(",") if w.strip()]
    elif inner:
        fs, _ = _compile(inner[0], sf_dir)
        terms = [r["term"] for r in fs.take_all()]  # bounded by numTerms
    else:
        raise StreamExprError("textLogit() needs terms= or a featuresSelection stream")
    if not terms:
        raise StreamExprError("textLogit(): empty feature set")
    ds = load(sf_dir, node.args[0], columns=sorted({field, outcome}))
    w, err, it = text_logit(
        ds, field, outcome, positive, terms, max_iterations=iters, learning_rate=lr
    )
    out = pa.table(
        {
            "term": pa.array(["__bias__"] + list(terms), pa.string()),
            "weight": pa.array(w, pa.float64()),
            "trainError": pa.array([err] * (len(terms) + 1), pa.float64()),
            "iteration": pa.array([it] * (len(terms) + 1), pa.int64()),
        }
    )
    return ray.data.from_arrow(out), None


_OPS = {
    "search": _op_search,
    "shuffle": _op_search,  # ShuffleStream.java: search via /export (same scan here)
    "select": _op_select,
    "rollup": _op_rollup,
    "hashRollup": _op_rollup,  # HashRollupStream: rollup IS hash-partitioned here
    "innerJoin": _op_inner_join,
    "leftOuterJoin": _op_left_join,
    "fullOuterJoin": _op_full_join,
    "outerHashJoin": _op_outer_hash_join,
    "hashJoin": _op_hash_join,
    "sql": _op_sql,
    "facet2D": _op_facet2d,
    "significantTerms": _op_significant_terms,
    "csv": _op_csv,
    "tsv": _op_tsv,
    "drill": _op_drill,
    "get": _op_get,
    "reduce": _op_reduce,
    "scoreNodes": _op_score_nodes,
    "featuresSelection": _op_features_selection,
    "features": _op_features_selection,  # Lang.java registers both names
    "textLogit": _op_text_logit,
    "train": _op_text_logit,  # Lang.java: train -> TextLogitStream
    "topic": _op_topic,
    "priority": _op_priority,
    "executor": _op_executor,
    "noop": _op_noop,
    "eval": _op_eval,
    "shortestPath": _op_shortest_path,
    "parseCSV": _op_csv,  # Lang.java registers parseCSV/parseTSV
    "parseTSV": _op_tsv,
    "export": _op_search,  # /export scan == the same pruned sorted read
    "unique": _op_unique,
    "top": _op_top,
    "having": _op_having,
    "sort": _op_sort,
    "merge": _op_merge,
    "fetch": _op_fetch,
    "intersect": _op_intersect,
    "complement": _op_complement,
    "facet": _op_facet,
    "stats": _op_stats,
    "timeseries": _op_timeseries,
    "cartesianProduct": _op_cartesian,
    "parallel": _op_parallel,
    "let": _op_let,
    "cat": _op_cat,
    "daemon": _op_daemon,
    "list": _op_list,
    "plist": _op_plist,
    "echo": _op_echo,
    "null": _op_null,
    "tuple": _op_tuple,
    "random": _op_random,
    "calc": _op_calc,
    "plot": _op_plot,
    "zplot": _op_zplot,
    "model": _op_model,
    "stream": _op_get,  # Lang.java: stream -> GetStream (re-emit a let() binding)
    "update": _op_update,
    "delete": _op_delete,
    "commit": _op_commit,
    "nodes": _op_nodes,
    "gatherNodes": _op_nodes,
    "knnSearch": _op_knn_search,
}


def stream_expr(sf_dir: str, expression: str):
    """Parse + compile a streaming expression; returns the lazy Dataset."""
    ds, _sort = _compile(parse_stream_expr(expression), sf_dir)
    return ds
