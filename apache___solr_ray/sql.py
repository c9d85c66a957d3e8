"""SQL front-end compiled onto Ray Data pipelines.

The reference ships a SQL interface over Apache Calcite whose planner
pushes relational operators down into engine requests — see
``solr/modules/sql/src/java/org/apache/solr/handler/sql/SolrProject.java``
(column projection), ``SolrFilter.java`` (WHERE → filter query),
``SolrAggregate.java`` (GROUP BY → facet/rollup), ``SolrSort.java``
(ORDER BY/LIMIT → sorted export), wired in ``SolrRules.java``. This module
is that surface rebuilt Ray-Data-first: a hand-rolled recursive-descent
parser for the SELECT / WHERE / GROUP BY / HAVING / ORDER BY / LIMIT
subset the reference push-downs target, compiled onto the same building
blocks the rest of this engine uses:

- referenced-column pruning at ``read_parquet``          (SolrProject)
- WHERE → ONE vectorized pyarrow.compute mask per batch  (SolrFilter)
- GROUP BY → per-batch pandas partials (sum/count/min/
  max; avg = final sum/count) + one small groupby over
  partials — raw rows never shuffle                      (SolrAggregate)
- ORDER BY / LIMIT → ``Dataset.sort(...).limit(n)``      (SolrSort)
- SELECT DISTINCT → groupby over the projected columns

Dialect (documented subset — everything else raises ``SqlError``):
  SELECT [DISTINCT] item [, item...]   item := expr [AS alias]
  FROM table [[AS] alias]
       [[INNER | LEFT [OUTER]] JOIN table [[AS] alias]
        ON a.x = b.y [AND a.p = b.q ...]] ...  -- left-deep equality join
        CHAIN (each ON joins the new table against any earlier table);
        per-join the planner
        broadcasts build sides <= SQL_BROADCAST_MAX parquet-metadata rows
        (ray.put + per-batch pandas merge, no shuffle) and runs bigger
        sides as Ray Data's distributed hash join. Scalar references must
        resolve to exactly one side (qualify only in ON).
  [WHERE expr] [GROUP BY col | alias | expr, ...] [HAVING expr]
        (alias/expression keys compute once per batch into a derived column
        before the partial stage)
  [ORDER BY name [ASC|DESC], ...] [LIMIT n [OFFSET m]]
  body (UNION [ALL] body)+ folds left-associatively (plain UNION dedupes
        the accumulated result with one groupby); the trailing
        ORDER BY/LIMIT/OFFSET applies to the whole union
  WITH name AS (query) [, ...] query  -- non-recursive CTEs; FROM
        (SELECT ...) alias derived tables are anonymous definitions on
        the same machinery. Definitions compile on demand (first FROM
        reference), materialize once and memoize per statement; cycles
        raise.
  WHERE-clause subqueries: e [NOT] IN (SELECT ...), [NOT] EXISTS
        (one equality correlation decorrelates to a semi-join),
        scalar (SELECT ...) folds to a literal
  expr: column, 'string', number, + - * / ( ), comparison (= <> != < <= > >=),
        AND OR NOT, IN (...), [NOT] LIKE, IS [NOT] NULL, BETWEEN lo AND hi,
        CAST(expr AS BIGINT|INTEGER|DOUBLE|FLOAT|VARCHAR),
        scalar functions floor abs ceil[ing] sqrt ln exp round(x[,n])
        upper lower length trim ltrim rtrim reverse substr(s,start[,len])
        concat(...) replace(s,'a','b')  (DuckDB semantics: round is
        half-away-from-zero, concat skips NULLs),
        CASE WHEN cond THEN expr [WHEN ...] [ELSE expr] END, coalesce(a, b, ...),
        aggregates count(*) | count(col) | count(DISTINCT col) | sum | avg
                   | min | max | stddev | variance (sample). stddev/variance
                   ride (sum, sumsq, n) partials; count(DISTINCT) compiles
                   to the two-level (keys, col) -> keys rewrite (one
                   distinct column per query); sum/avg/min/max/count also
                   take computed expressions (sum(CASE WHEN ...)) via a
                   once-per-batch derived column
  ``/`` is double division (DuckDB semantics). Computed select items
  require an alias so output names match the oracle exactly.

Scale notes: the only shuffle a SQL query performs is the final groupby
over (groups × blocks) partial rows and/or the ORDER BY sort — never the
raw input; the scan is column-pruned and the WHERE mask runs before
anything leaves the read tasks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class SqlError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Col:
    name: str


@dataclass(frozen=True)
class Lit:
    val: object


@dataclass(frozen=True)
class Bin:
    op: str  # + - * /
    l: object
    r: object


@dataclass(frozen=True)
class Cmp:
    op: str  # = <> < <= > >=
    l: object
    r: object


@dataclass(frozen=True)
class Logic:
    op: str  # and | or
    items: tuple


@dataclass(frozen=True)
class NotOp:
    e: object


@dataclass(frozen=True)
class InList:
    e: object
    vals: tuple
    negate: bool = False


@dataclass(frozen=True)
class SubqueryOp:
    """Unresolved subquery predicate (parse-time only): ``e [NOT] IN
    (SELECT ...)``, ``EXISTS (SELECT ...)`` or a scalar ``(SELECT ...)``
    operand. ``_resolve_subqueries`` executes/decorrelates these into
    InSet / Lit / BoolLit BEFORE the plan compiles, so the batch evaluator
    never sees one (Solr's SQL module has no subqueries at all — this is
    front-door surface the reference's users expect from Calcite SQL)."""

    e: object  # lhs expression for IN; None for EXISTS / scalar
    query: object  # Query
    kind: str  # "in" | "exists" | "scalar"
    negate: bool = False


@dataclass(frozen=True)
class InSet:
    """Resolved IN-subquery: a materialized value set. NULL semantics are
    ANSI: ``x IN (set)`` is FALSE for NULL x (row dropped either way);
    ``x NOT IN (set)`` keeps only valid x not in the set, and keeps NOTHING
    when the set contains a NULL (the comparison is UNKNOWN for every row)."""

    e: object
    vals: tuple
    negate: bool = False
    has_null: bool = False


@dataclass(frozen=True)
class BoolLit:
    """Constant predicate (an uncorrelated EXISTS resolves to one)."""

    val: bool


@dataclass(frozen=True)
class LikeOp:
    e: object
    pattern: str
    negate: bool = False


@dataclass(frozen=True)
class IsNullOp:
    e: object
    negate: bool = False


@dataclass(frozen=True)
class CastOp:
    e: object
    typ: str


@dataclass(frozen=True)
class CoalesceOp:
    items: tuple


@dataclass(frozen=True)
class CaseOp:
    whens: tuple  # ((cond, value), ...)
    default: object | None


@dataclass(frozen=True)
class Func:
    name: str  # single-arg scalar: floor | abs | upper | lower | ...
    e: object


@dataclass(frozen=True)
class FuncN:
    name: str  # multi-arg scalar: round | substr | concat | replace
    args: tuple


@dataclass(frozen=True)
class Agg:
    func: str  # count | sum | avg | min | max
    col: str | None  # None = count(*)
    expr: object = None  # non-None: aggregate over a computed expression


@dataclass
class Item:
    expr: object
    alias: str | None


@dataclass(frozen=True)
class Join:
    table: str
    alias: str | None
    kind: str  # inner | left
    on: tuple  # ((qual|None, name), (qual|None, name)) pairs


@dataclass
class Query:
    items: list
    distinct: bool
    table: str
    where: object | None
    group_by: list
    having: object | None
    order_by: list  # [(name, desc)]
    limit: int | None
    offset: int = 0
    table_alias: str | None = None
    joins: tuple = ()


@dataclass
class UnionQuery:
    """``body (UNION [ALL] body)+`` — folded left-associatively; a plain
    UNION link dedupes everything accumulated so far (ANSI). The trailing
    ORDER BY / LIMIT / OFFSET (parsed into the last body) applies to the
    whole union and references the FIRST body's output column names."""

    first: object  # Query
    links: list  # [(is_all, Query)]
    order_by: list
    limit: int | None
    offset: int


@dataclass
class WithQuery:
    """``WITH name AS (query) [, ...] query`` — non-recursive CTEs, plus
    the anonymous definitions synthesized for derived tables
    (``FROM (SELECT ...) alias``). Definitions compile ON DEMAND (a rel is
    materialized the first time a FROM references it, memoized for reuse),
    so declaration order doesn't constrain reference order; cycles raise."""

    defs: list  # [(name, Query | UnionQuery)]
    main: object  # Query | UnionQuery


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<id>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*|\+|-|/|\.)"
    r")"
)

_KEYWORDS = {
    "select", "distinct", "from", "where", "group", "by", "having", "order",
    "limit", "as", "and", "or", "not", "in", "like", "is", "null", "between",
    "cast", "asc", "desc", "join", "inner", "left", "outer", "on",
    "case", "when", "then", "else", "end", "exists", "union", "all", "with",
}


def _tokenize(sql: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            rest = sql[pos:].strip()
            if not rest:
                break
            raise SqlError(f"cannot tokenize near: {rest[:30]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "id":
            word = m.group("id")
            out.append(("kw" if word.lower() in _KEYWORDS else "id", word))
        else:
            out.append(("op", m.group("op")))
    return out


# ---------------------------------------------------------------------------
# Parser (recursive descent; precedence: OR < AND < NOT < cmp < add < mul)
# ---------------------------------------------------------------------------

_AGG_FUNCS = {"count", "sum", "avg", "min", "max", "stddev", "variance"}
_SCALAR_FUNCS = {
    "floor", "abs", "ceil", "ceiling", "upper", "lower", "length", "sqrt",
    "ln", "exp", "trim", "ltrim", "rtrim", "reverse",
}
_SCALAR_FUNCS_N = {"round", "substr", "substring", "concat", "replace"}
_CAST_TYPES = {
    "bigint": pa.int64(),
    "integer": pa.int32(),
    "int": pa.int32(),
    "double": pa.float64(),
    "float": pa.float32(),
    "varchar": pa.string(),
}


class _Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def at_kw(self, *words) -> bool:
        typ, v = self.peek()
        return typ == "kw" and v.lower() in words

    def eat_kw(self, word: str) -> bool:
        if self.at_kw(word):
            self.i += 1
            return True
        return False

    def expect_kw(self, word: str):
        if not self.eat_kw(word):
            raise SqlError(f"expected {word.upper()} at token {self.peek()}")

    def at_op(self, *ops) -> bool:
        typ, v = self.peek()
        return typ == "op" and v in ops

    def eat_op(self, op: str) -> bool:
        if self.at_op(op):
            self.i += 1
            return True
        return False

    def expect_op(self, op: str):
        if not self.eat_op(op):
            raise SqlError(f"expected {op!r} at token {self.peek()}")

    def ident(self) -> str:
        typ, v = self.next()
        if typ != "id":
            raise SqlError(f"expected identifier, got {typ} {v!r}")
        # strip a table qualifier (single-table queries)
        if self.at_op("."):
            self.i += 1
            typ2, v2 = self.next()
            if typ2 != "id":
                raise SqlError("expected identifier after '.'")
            return v2
        return v

    # -- grammar ------------------------------------------------------------
    def parse(self) -> Query:
        self._defs: list = []
        if self.eat_kw("with"):
            while True:
                typ, name = self.next()
                if typ != "id":
                    raise SqlError("expected CTE name after WITH")
                self.expect_kw("as")
                self.expect_op("(")
                self._defs.append((name, self._query_expr()))
                self.expect_op(")")
                if not self.eat_op(","):
                    break
        q = self._query_expr()
        if self.peek() != (None, None):
            raise SqlError(f"unexpected trailing tokens: {self.peek()}")
        if self._defs:
            return WithQuery(list(self._defs), q)
        return q

    def _query_expr(self) -> Query:
        q = self._parse_body()
        links = []
        while self.eat_kw("union"):
            is_all = self.eat_kw("all")
            links.append((is_all, self._parse_body()))
        if not links:
            return q
        last = links[-1][1]
        order_by, limit, offset = last.order_by, last.limit, last.offset
        last.order_by, last.limit, last.offset = [], None, 0
        for part in [q] + [p for _, p in links]:
            if part.order_by or part.limit is not None or part.offset:
                raise SqlError(
                    "ORDER BY/LIMIT inside a UNION branch is not supported "
                    "(the trailing clause applies to the whole union)"
                )
            if len(part.items) != len(q.items):
                raise SqlError("UNION branches must select the same column count")
        return UnionQuery(q, links, order_by, limit, offset)

    def _parse_body(self) -> Query:
        self.expect_kw("select")
        distinct = self.eat_kw("distinct")
        items = [self.select_item()]
        while self.eat_op(","):
            items.append(self.select_item())
        self.expect_kw("from")
        if self.at_op("("):
            # derived table: FROM (SELECT ...) alias — synthesized as an
            # anonymous WITH definition under the alias name
            self.i += 1
            sub = self._query_expr()
            self.expect_op(")")
            alias = self.table_alias()
            if not alias:
                raise SqlError("derived table needs an alias: FROM (SELECT ...) name")
            if not hasattr(self, "_defs"):
                self._defs = []
            self._defs.append((alias, sub))
            table, table_alias = alias, alias
        else:
            table = self.ident()
            table_alias = self.table_alias()
        joins = []
        while True:
            j = self.join_clause()
            if j is None:
                break
            joins.append(j)
        where = self.expr() if self.eat_kw("where") else None
        group_by: list[str] = []
        if self.eat_kw("group"):
            self.expect_kw("by")
            while True:
                e = self.expr()
                group_by.append(e.name if isinstance(e, Col) else e)
                if not self.eat_op(","):
                    break
        having = self.expr() if self.eat_kw("having") else None
        order_by: list[tuple[str, bool]] = []
        if self.eat_kw("order"):
            self.expect_kw("by")
            while True:
                name = self.ident()
                desc = False
                if self.eat_kw("desc"):
                    desc = True
                else:
                    self.eat_kw("asc")
                order_by.append((name, desc))
                if not self.eat_op(","):
                    break
        limit = None
        offset = 0
        if self.eat_kw("limit"):
            typ, v = self.next()
            if typ != "num" or "." in v:
                raise SqlError("LIMIT expects an integer")
            limit = int(v)
            typ2, v2 = self.peek()
            if typ2 == "id" and v2.lower() == "offset":
                self.i += 1
                t3, v3 = self.next()
                if t3 != "num" or "." in v3:
                    raise SqlError("OFFSET expects an integer")
                offset = int(v3)
        return Query(
            items, distinct, table, where, group_by, having, order_by, limit,
            offset, table_alias, tuple(joins),
        )

    def _subquery(self) -> Query:
        """Parse ``SELECT ...`` up to (not including) the caller's ')'."""
        return self._parse_body()

    def table_alias(self) -> str | None:
        """Optional [AS] alias after a table name (scalar refs strip
        qualifiers; the alias matters only for resolving JOIN ON sides)."""
        if self.eat_kw("as"):
            typ, v = self.next()
            if typ != "id":
                raise SqlError("expected alias identifier after AS")
            return v
        if self.peek()[0] == "id":
            return self.next()[1]
        return None

    def join_clause(self) -> Join | None:
        """[INNER | LEFT [OUTER]] JOIN table [[AS] alias] ON a.x = b.y
        [AND ...] — single equality join (the engine's broadcast /
        distributed hash-join planner picks the physical plan)."""
        kind = None
        if self.eat_kw("inner"):
            kind = "inner"
        elif self.eat_kw("left"):
            self.eat_kw("outer")
            kind = "left"
        if not self.eat_kw("join"):
            if kind is not None:
                raise SqlError("expected JOIN after INNER/LEFT")
            return None
        kind = kind or "inner"
        table = self.ident_raw()
        alias = self.table_alias()
        self.expect_kw("on")
        pairs = [self.on_equality()]
        while self.at_kw("and") and self.is_on_equality_ahead():
            self.expect_kw("and")
            pairs.append(self.on_equality())
        return Join(table, alias, kind, tuple(pairs))

    def ident_raw(self) -> str:
        typ, v = self.next()
        if typ != "id":
            raise SqlError(f"expected identifier, got {typ} {v!r}")
        return v

    def qual_ident(self) -> tuple:
        """(qualifier | None, name) — qualifiers are meaningful in ON."""
        name = self.ident_raw()
        if self.at_op("."):
            self.i += 1
            return (name, self.ident_raw())
        return (None, name)

    def on_equality(self) -> tuple:
        l = self.qual_ident()
        self.expect_op("=")
        r = self.qual_ident()
        return (l, r)

    def is_on_equality_ahead(self) -> bool:
        """Lookahead distinguishing `ON a=b AND c=d` from a following WHERE
        predicate: an ON conjunct is ident[.ident] = ident[.ident]."""
        j = self.i + 1  # past AND
        def is_id(p):
            return p < len(self.toks) and self.toks[p][0] == "id"
        if not is_id(j):
            return False
        j += 1
        if j < len(self.toks) and self.toks[j] == ("op", "."):
            j += 1
            if not is_id(j):
                return False
            j += 1
        if j >= len(self.toks) or self.toks[j] != ("op", "="):
            return False
        j += 1
        if not is_id(j):
            return False
        j += 1
        if j < len(self.toks) and self.toks[j] == ("op", "."):
            j += 1
            return is_id(j)
        return True

    def select_item(self) -> Item:
        e = self.expr()
        alias = None
        if self.eat_kw("as"):
            typ, v = self.next()
            if typ != "id":
                raise SqlError("expected alias after AS")
            alias = v
        return Item(e, alias)

    def expr(self):
        return self.or_expr()

    def or_expr(self):
        items = [self.and_expr()]
        while self.eat_kw("or"):
            items.append(self.and_expr())
        return items[0] if len(items) == 1 else Logic("or", tuple(items))

    def and_expr(self):
        items = [self.not_expr()]
        while self.eat_kw("and"):
            items.append(self.not_expr())
        return items[0] if len(items) == 1 else Logic("and", tuple(items))

    def not_expr(self):
        if self.eat_kw("not"):
            return NotOp(self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self):
        if self.at_kw("exists"):
            self.i += 1
            self.expect_op("(")
            if not self.at_kw("select"):
                raise SqlError("EXISTS expects a subquery")
            sub = self._subquery()
            self.expect_op(")")
            return SubqueryOp(None, sub, "exists")
        l = self.add_expr()
        negate = self.eat_kw("not")
        if self.eat_kw("in"):
            self.expect_op("(")
            if self.at_kw("select"):
                sub = self._subquery()
                self.expect_op(")")
                return SubqueryOp(l, sub, "in", negate)
            vals = [self._literal()]
            while self.eat_op(","):
                vals.append(self._literal())
            self.expect_op(")")
            return InList(l, tuple(vals), negate)
        if self.eat_kw("like"):
            typ, v = self.next()
            if typ != "str":
                raise SqlError("LIKE expects a string pattern")
            return LikeOp(l, v, negate)
        if self.eat_kw("between"):
            lo = self.add_expr()
            self.expect_kw("and")
            hi = self.add_expr()
            node = Logic("and", (Cmp(">=", l, lo), Cmp("<=", l, hi)))
            return NotOp(node) if negate else node
        if negate:
            raise SqlError("NOT must precede IN / LIKE / BETWEEN here")
        if self.eat_kw("is"):
            neg = self.eat_kw("not")
            self.expect_kw("null")
            return IsNullOp(l, neg)
        for op in ("<=", ">=", "<>", "!=", "=", "<", ">"):
            if self.eat_op(op):
                r = self.add_expr()
                return Cmp("<>" if op == "!=" else op, l, r)
        return l

    def add_expr(self):
        l = self.mul_expr()
        while self.at_op("+", "-"):
            _, op = self.next()
            l = Bin(op, l, self.mul_expr())
        return l

    def mul_expr(self):
        l = self.unary()
        while self.at_op("*", "/"):
            _, op = self.next()
            l = Bin(op, l, self.unary())
        return l

    def unary(self):
        if self.eat_op("-"):
            return Bin("-", Lit(0), self.unary())
        return self.primary()

    def _literal(self):
        if self.eat_op("-"):
            typ, v = self.next()
            if typ != "num":
                raise SqlError("expected number after '-'")
            return Lit(-(float(v) if "." in v else int(v)))
        typ, v = self.next()
        if typ == "num":
            return Lit(float(v) if "." in v else int(v))
        if typ == "str":
            return Lit(v)
        if typ == "kw" and v.lower() == "null":
            return Lit(None)
        raise SqlError(f"expected literal, got {typ} {v!r}")

    def primary(self):
        typ, v = self.peek()
        if typ == "num" or typ == "str":
            return self._literal()
        if typ == "kw" and v.lower() == "null":
            self.i += 1
            return Lit(None)
        if typ == "kw" and v.lower() == "case":
            self.i += 1
            whens = []
            while self.eat_kw("when"):
                c = self.expr()
                self.expect_kw("then")
                whens.append((c, self.expr()))
            if not whens:
                raise SqlError("CASE needs at least one WHEN")
            default = self.expr() if self.eat_kw("else") else None
            self.expect_kw("end")
            return CaseOp(tuple(whens), default)
        if typ == "kw" and v.lower() == "cast":
            self.i += 1
            self.expect_op("(")
            e = self.expr()
            self.expect_kw("as")
            t_typ, t_v = self.next()
            if t_typ != "id" and t_typ != "kw":
                raise SqlError("expected type name in CAST")
            t_name = t_v.lower()
            if t_name not in _CAST_TYPES:
                raise SqlError(f"unsupported CAST type {t_v!r}")
            self.expect_op(")")
            return CastOp(e, t_name)
        if typ == "id" and self.peek(1) == ("op", "("):
            fname = v.lower()
            self.i += 2
            if fname in _AGG_FUNCS:
                if fname == "count" and self.eat_op("*"):
                    self.expect_op(")")
                    return Agg("count", None)
                if fname == "count" and self.eat_kw("distinct"):
                    col = self.ident()
                    self.expect_op(")")
                    return Agg("count_distinct", col)
                e = self.expr()
                self.expect_op(")")
                if isinstance(e, Col):
                    return Agg(fname, e.name)
                # aggregate over a computed expression: evaluated into a
                # derived column before the partial stage
                return Agg(fname, None, e)
            if fname in _SCALAR_FUNCS:
                e = self.expr()
                self.expect_op(")")
                return Func(fname, e)
            if fname in _SCALAR_FUNCS_N:
                items = [self.expr()]
                while self.eat_op(","):
                    items.append(self.expr())
                self.expect_op(")")
                return FuncN(fname, tuple(items))
            if fname == "coalesce":
                items = [self.expr()]
                while self.eat_op(","):
                    items.append(self.expr())
                self.expect_op(")")
                return CoalesceOp(tuple(items))
            raise SqlError(f"unsupported function {v!r}")
        if typ == "id":
            self.i += 1
            if self.at_op("."):
                self.i += 1
                t2, v2 = self.next()
                if t2 != "id":
                    raise SqlError("expected identifier after '.'")
                return Col(v2)
            return Col(v)
        if self.eat_op("("):
            if self.at_kw("select"):
                sub = self._subquery()
                self.expect_op(")")
                return SubqueryOp(None, sub, "scalar")
            e = self.expr()
            self.expect_op(")")
            return e
        raise SqlError(f"unexpected token {typ} {v!r}")


def parse_sql(sql: str) -> Query:
    return _Parser(sql).parse()


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------


def _walk(node, out_cols: set, out_aggs: list):
    """Collect referenced column names and Agg nodes (in encounter order)."""
    if isinstance(node, Col):
        out_cols.add(node.name)
    elif isinstance(node, Agg):
        if node.col is not None:
            out_cols.add(node.col)
        if node.expr is not None:
            inner: list = []
            _walk(node.expr, out_cols, inner)
            if inner:
                raise SqlError("aggregates cannot nest")
        if node not in out_aggs:
            out_aggs.append(node)
    elif isinstance(node, Bin) or isinstance(node, Cmp):
        _walk(node.l, out_cols, out_aggs)
        _walk(node.r, out_cols, out_aggs)
    elif isinstance(node, Logic):
        for it in node.items:
            _walk(it, out_cols, out_aggs)
    elif isinstance(node, (NotOp, IsNullOp, LikeOp, InList, CastOp, Func)):
        _walk(node.e, out_cols, out_aggs)
    elif isinstance(node, FuncN):
        for a in node.args:
            _walk(a, out_cols, out_aggs)
    elif isinstance(node, InSet):
        _walk(node.e, out_cols, out_aggs)
    elif isinstance(node, BoolLit):
        pass
    elif isinstance(node, SubqueryOp):
        raise SqlError("subqueries are supported in WHERE only")
    elif isinstance(node, CaseOp):
        for c, v in node.whens:
            _walk(c, out_cols, out_aggs)
            _walk(v, out_cols, out_aggs)
        if node.default is not None:
            _walk(node.default, out_cols, out_aggs)
    elif isinstance(node, CoalesceOp):
        for e in node.items:
            _walk(e, out_cols, out_aggs)
    elif isinstance(node, Lit) or node is None:
        pass
    else:  # pragma: no cover
        raise SqlError(f"unknown node {node!r}")


def _bare_cols(node, out: set):
    """Column refs NOT inside an aggregate (for the grouping-rule check)."""
    if isinstance(node, Col):
        out.add(node.name)
    elif isinstance(node, Agg):
        pass
    elif isinstance(node, (Bin, Cmp)):
        _bare_cols(node.l, out)
        _bare_cols(node.r, out)
    elif isinstance(node, Logic):
        for it in node.items:
            _bare_cols(it, out)
    elif isinstance(node, (NotOp, IsNullOp, LikeOp, InList, CastOp, Func)):
        _bare_cols(node.e, out)
    elif isinstance(node, FuncN):
        for a in node.args:
            _bare_cols(a, out)
    elif isinstance(node, InSet):
        _bare_cols(node.e, out)
    elif isinstance(node, CaseOp):
        for c, v in node.whens:
            _bare_cols(c, out)
            _bare_cols(v, out)
        if node.default is not None:
            _bare_cols(node.default, out)
    elif isinstance(node, CoalesceOp):
        for e in node.items:
            _bare_cols(e, out)


def _eval(node, t: pa.Table, agg_name=None):
    """Vectorized expression evaluation over an Arrow table. ``agg_name``
    maps Agg nodes to materialized column names (aggregate stage output)."""
    if isinstance(node, Col):
        return t.column(node.name)
    if isinstance(node, Lit):
        return pa.scalar(node.val)
    if isinstance(node, Agg):
        if agg_name is None:
            raise SqlError("aggregate used outside an aggregate query")
        return t.column(agg_name[node])
    if isinstance(node, Bin):
        l, r = _eval(node.l, t, agg_name), _eval(node.r, t, agg_name)
        if node.op == "+":
            return pc.add(l, r)
        if node.op == "-":
            return pc.subtract(l, r)
        if node.op == "*":
            return pc.multiply(l, r)
        # '/': double division (DuckDB); pc.divide on ints would truncate
        return pc.divide(pc.cast(l, pa.float64()), pc.cast(r, pa.float64()))
    if isinstance(node, Cmp):
        l, r = _eval(node.l, t, agg_name), _eval(node.r, t, agg_name)
        fn = {
            "=": pc.equal,
            "<>": pc.not_equal,
            "<": pc.less,
            "<=": pc.less_equal,
            ">": pc.greater,
            ">=": pc.greater_equal,
        }[node.op]
        return fn(l, r)
    if isinstance(node, Logic):
        vals = [_eval(it, t, agg_name) for it in node.items]
        out = vals[0]
        comb = pc.and_kleene if node.op == "and" else pc.or_kleene
        for v in vals[1:]:
            out = comb(out, v)
        return out
    if isinstance(node, NotOp):
        return pc.invert(_eval(node.e, t, agg_name))
    if isinstance(node, InList):
        vals = [v.val for v in node.vals]
        m = pc.is_in(_eval(node.e, t, agg_name), value_set=pa.array(vals))
        return pc.invert(m) if node.negate else m
    if isinstance(node, BoolLit):
        return pa.array(np.full(t.num_rows, node.val))
    if isinstance(node, InSet):
        lhs = _eval(node.e, t, agg_name)
        if not node.vals:
            base = pa.array(np.zeros(t.num_rows, dtype=bool))
        else:
            base = pc.is_in(lhs, value_set=pa.array(list(node.vals)))
        if node.negate:
            if node.has_null:  # NOT IN over a set with NULL keeps nothing
                return pa.array(np.zeros(t.num_rows, dtype=bool))
            return pc.and_(pc.invert(base), pc.is_valid(lhs))
        return base
    if isinstance(node, LikeOp):
        m = pc.match_like(_eval(node.e, t, agg_name), node.pattern)
        return pc.invert(m) if node.negate else m
    if isinstance(node, IsNullOp):
        v = _eval(node.e, t, agg_name)
        return pc.is_valid(v) if node.negate else pc.is_null(v)
    if isinstance(node, CastOp):
        v = _eval(node.e, t, agg_name)
        target = _CAST_TYPES[node.typ]
        vt = v.type if not isinstance(v, pa.Scalar) else v.type
        if pa.types.is_integer(target) and pa.types.is_floating(vt):
            # DuckDB CAST(double AS BIGINT) rounds half away from zero;
            # arrow's checked cast would raise on any fractional value
            return pc.cast(
                pc.round(v, round_mode="half_towards_infinity"), target, safe=False
            )
        return pc.cast(v, target)
    if isinstance(node, CoalesceOp):
        vals = [_eval(e, t, agg_name) for e in node.items]
        return pc.coalesce(*vals)
    if isinstance(node, CaseOp):
        vals = [_eval(v, t, agg_name) for _, v in node.whens]
        conds = [_eval(c, t, agg_name) for c, _ in node.whens]
        if node.default is not None:
            out = _eval(node.default, t, agg_name)
        else:
            # untyped NULL default: null of the first branch's type
            vt = vals[0].type
            out = pa.scalar(None, vt)
        for c, v in zip(reversed(conds), reversed(vals)):
            out = pc.if_else(c, v, out)
        return out
    if isinstance(node, Func):
        v = _eval(node.e, t, agg_name)
        n = node.name
        if n == "floor":
            return pc.floor(pc.cast(v, pa.float64()))
        if n == "abs":
            return pc.abs(v)
        if n in ("ceil", "ceiling"):
            return pc.ceil(pc.cast(v, pa.float64()))
        if n == "upper":
            return pc.utf8_upper(v)
        if n == "lower":
            return pc.utf8_lower(v)
        if n == "length":
            return pc.cast(pc.utf8_length(v), pa.int64())
        if n == "sqrt":
            return pc.sqrt(pc.cast(v, pa.float64()))
        if n == "ln":
            return pc.ln(pc.cast(v, pa.float64()))
        if n == "exp":
            return pc.exp(pc.cast(v, pa.float64()))
        if n == "trim":
            return pc.utf8_trim_whitespace(v)
        if n == "ltrim":
            return pc.utf8_ltrim_whitespace(v)
        if n == "rtrim":
            return pc.utf8_rtrim_whitespace(v)
        if n == "reverse":
            return pc.utf8_reverse(v)
        raise SqlError(f"unsupported function {n!r}")
    if isinstance(node, FuncN):
        n = node.name
        if n == "round":
            # DuckDB round() is half away from zero
            if len(node.args) not in (1, 2):
                raise SqlError("round(x[, ndigits]) expects 1-2 arguments")
            nd = 0
            if len(node.args) == 2:
                if not isinstance(node.args[1], Lit):
                    raise SqlError("round() ndigits must be a literal")
                nd = int(node.args[1].val)
            v = pc.cast(_eval(node.args[0], t, agg_name), pa.float64())
            return pc.round(v, ndigits=nd, round_mode="half_towards_infinity")
        if n in ("substr", "substring"):
            # SQL 1-based start; optional length
            if len(node.args) not in (2, 3):
                raise SqlError("substr(s, start[, len]) expects 2-3 arguments")
            if not all(isinstance(a, Lit) for a in node.args[1:]):
                raise SqlError("substr() start/len must be literals")
            start = int(node.args[1].val) - 1
            if start < 0:
                raise SqlError("substr() start is 1-based")
            stop = None
            if len(node.args) == 3:
                stop = start + int(node.args[2].val)
            v = _eval(node.args[0], t, agg_name)
            return pc.utf8_slice_codeunits(v, start, stop)
        if n == "concat":
            # DuckDB concat() skips NULLs (unlike ||)
            vals = [
                _as_array(_eval(a, t, agg_name), t.num_rows) for a in node.args
            ]
            vals = [
                pc.cast(v, pa.string()) if not pa.types.is_string(v.type) else v
                for v in vals
            ]
            return pc.binary_join_element_wise(
                *vals, pa.array([""] * t.num_rows), null_handling="replace"
            )
        if n == "replace":
            if len(node.args) != 3 or not all(
                isinstance(a, Lit) for a in node.args[1:]
            ):
                raise SqlError("replace(s, 'from', 'to') with literal patterns")
            v = _eval(node.args[0], t, agg_name)
            return pc.replace_substring(
                v, pattern=str(node.args[1].val), replacement=str(node.args[2].val)
            )
        raise SqlError(f"unsupported function {n!r}")
    raise SqlError(f"cannot evaluate {node!r}")


def _as_array(v, n: int):
    """Broadcast a scalar result to an n-row array (constant select item)."""
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v
    return pa.nulls(n, v.type) if v.as_py() is None else pa.array([v.as_py()] * n)


def _item_name(item: Item) -> str:
    if item.alias:
        return item.alias
    if isinstance(item.expr, Col):
        return item.expr.name
    raise SqlError("computed select items require an AS alias (oracle naming)")


#: build sides at or below this parquet-metadata row count broadcast
#: (ray.put once + per-batch pandas merge, no shuffle); above it the join
#: runs as Ray Data's distributed hash join
SQL_BROADCAST_MAX = 2_000_000


#: in-flight WITH/derived-table definitions, innermost statement last:
#: {name: [node, compiled_Dataset_or_None_or_"__compiling__"]}
_REL_DEFS: list[dict] = []


def _resolve_rel(sf_dir: str, name: str):
    """Return the materialized Dataset for a WITH/derived-table name, or
    None for a plain parquet table. Definitions compile on first use and
    memoize (one execution per statement however many FROMs reference it);
    the marker value catches circular references."""
    for frame in reversed(_REL_DEFS):
        if name in frame:
            slot = frame[name]
            if slot[1] == "__compiling__":
                raise SqlError(f"circular WITH reference: {name!r}")
            if slot[1] is None:
                slot[1] = "__compiling__"
                node = slot[0]
                fn = _compile_union if isinstance(node, UnionQuery) else _compile_query
                slot[1] = fn(sf_dir, node).materialize()
            return slot[1]
    return None


def _load_rel(sf_dir: str, table: str, columns=None):
    """FROM-relation loader: WITH/derived definitions resolve to their
    materialized Datasets (column-pruned by select_columns); everything
    else is the pruned parquet read."""
    ds = _resolve_rel(sf_dir, table)
    if ds is None:
        from apache___solr_ray.sources import load

        return load(sf_dir, table, columns=columns)
    return ds.select_columns(list(columns)) if columns else ds


def _load_rel_arrow(sf_dir: str, table: str, columns=None) -> pa.Table:
    ds = _resolve_rel(sf_dir, table)
    if ds is None:
        from apache___solr_ray.sources import load_arrow

        return load_arrow(sf_dir, table, columns=columns)
    import ray

    if columns:
        ds = ds.select_columns(list(columns))
    return pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])


def _table_schema_names(sf_dir: str, table: str) -> list[str]:
    import os

    import pyarrow.parquet as pq

    ds = _resolve_rel(sf_dir, table)
    if ds is not None:
        return list(ds.schema().names)
    return pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).schema_arrow.names


def _table_rows(sf_dir: str, table: str) -> int:
    import os

    import pyarrow.parquet as pq

    ds = _resolve_rel(sf_dir, table)
    if ds is not None:
        return ds.count()  # materialized: block-metadata count
    return pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows


def _compile_join(sf_dir: str, q: Query, cols: set):
    """FROM t1 JOIN t2 ON ... [JOIN t3 ON ...] — a left-deep join chain
    with the size-adaptive physical plan the rest of the engine uses
    (reference join surface: JoinQParserPlugin / HashJoinStream vs the
    distributed InnerJoinStream): each build side whose parquet metadata
    says <= SQL_BROADCAST_MAX rows is collected once, ``ray.put``, and
    probed with a vectorized pandas merge per batch — no shuffle; bigger
    sides use ``Dataset.join`` (both sides hash-partitioned on the key).
    Every ON equality joins the NEW table against the accumulated
    relation (any earlier table). Scalar column references must resolve
    to exactly one table (TPC-H-style disjoint names; qualify only in
    ON)."""
    from apache___solr_ray.sources import load

    # per-relation schema/name info: index 0 = base table, i = join i-1
    rels = [(q.table, q.table_alias)] + [(j.table, j.alias) for j in q.joins]
    rel_names = [set(_table_schema_names(sf_dir, t)) for t, _ in rels]
    rel_alias = [{t, a} for t, a in rels]

    def owner_of(qual, name, upto: int) -> int:
        """Resolve a column to one relation among rels[0..upto]."""
        if qual is not None:
            for i in range(upto + 1):
                if qual in rel_alias[i]:
                    return i
            raise SqlError(f"unknown table qualifier {qual!r}")
        hits = [i for i in range(upto + 1) if name in rel_names[i]]
        if len(hits) > 1:
            raise SqlError(f"ambiguous ON column {name!r}: qualify it")
        if not hits:
            raise SqlError(f"ON column {name!r} not found")
        return hits[0]

    # resolve every join's keys; the right side is relation k+1, the left
    # side any relation 0..k
    join_keys: list[tuple[list[str], list[str]]] = []
    for k, j in enumerate(q.joins):
        lkeys, rkeys = [], []
        for (aq, an), (bq, bn) in j.on:
            oa = owner_of(aq, an, k + 1)
            ob = owner_of(bq, bn, k + 1)
            if (oa == k + 1) == (ob == k + 1):
                raise SqlError(
                    "each ON equality must reference the joined table on "
                    "exactly one side (and earlier tables on the other)"
                )
            if oa == k + 1:
                lkeys.append(bn)
                rkeys.append(an)
            else:
                lkeys.append(an)
                rkeys.append(bn)
        join_keys.append((lkeys, rkeys))

    # column pruning per relation: referenced cols + every key it owns
    need = [set() for _ in rels]
    for c in cols:
        hits = [i for i in range(len(rels)) if c in rel_names[i]]
        if len(hits) > 1:
            raise SqlError(
                f"column {c!r} exists in multiple tables — JOIN queries "
                "need disjoint referenced column names (qualify only in ON)"
            )
        if not hits:
            raise SqlError(f"column {c!r} not found in any table")
        need[hits[0]].add(c)
    for k, (lkeys, rkeys) in enumerate(join_keys):
        need[k + 1].update(rkeys)
        for lk in lkeys:
            need[owner_of(None, lk, k)].add(lk)

    acc = _load_rel(sf_dir, rels[0][0], columns=sorted(need[0]))
    for k, j in enumerate(q.joins):
        lkeys, rkeys = join_keys[k]
        rcols = sorted(need[k + 1])
        drop_rkeys = [x for x in rkeys if x not in cols]
        n_right = _table_rows(sf_dir, j.table)
        how = "left" if j.kind == "left" else "inner"
        if n_right <= SQL_BROADCAST_MAX:
            import ray

            from apache___solr_ray.sources import load_arrow

            rt = _load_rel_arrow(sf_dir, j.table, columns=rcols).to_pandas()
            ref = ray.put(rt)
            state: dict = {}

            def probe(
                df: pd.DataFrame, _ref=ref, _lk=tuple(lkeys), _rk=tuple(rkeys),
                _how=how, _drop=tuple(drop_rkeys), _state=state,
            ) -> pd.DataFrame:
                if "r" not in _state:
                    _state["r"] = ray.get(_ref)
                out = df.merge(
                    _state["r"], left_on=list(_lk), right_on=list(_rk), how=_how
                )
                d = [x for x in _drop if x in out.columns]
                return out.drop(columns=d) if d else out

            acc = acc.map_batches(probe, batch_format="pandas")
            continue
        # big build side: distributed hash join, partitions sized to CPUs/4
        # (aggregator-actor count must not wedge small sessions)
        from apache___solr_ray.stages.dedup import _default_join_partitions

        from apache___solr_ray.pipelines.common import native_join

        rds = _load_rel(sf_dir, j.table, columns=rcols)
        acc = native_join(
            acc,
            rds,
            ("left_outer" if j.kind == "left" else "inner"),
            _default_join_partitions(),
            on=tuple(lkeys),
            right_on=tuple(rkeys),
        )
        if drop_rkeys:
            acc = acc.map_batches(
                lambda t, _d=tuple(drop_rkeys): t.drop_columns(
                    [c for c in _d if c in t.column_names]
                ),
                batch_format="pyarrow",
            )
    return acc


#: collected-subquery bound — same contract as streamexpr's HASHED_SIDE_MAX:
#: an IN-subquery's DISTINCT key set is bounded model state, checked with a
#: metadata-cheap count BEFORE collection
SQL_SUBQUERY_MAX = 5_000_000


def _split_and(node) -> list:
    if isinstance(node, Logic) and node.op == "and":
        out: list = []
        for it in node.items:
            out.extend(_split_and(it))
        return out
    return [node] if node is not None else []


def _and_all(conjuncts: list):
    if not conjuncts:
        return None
    if len(conjuncts) == 1:
        return conjuncts[0]
    return Logic("and", tuple(conjuncts))


def _prep_subq(subq):
    """Internal subqueries don't face the oracle, so an unnamed computed
    item gets a synthetic alias instead of tripping the AS-alias rule."""
    import copy

    subq = copy.deepcopy(subq)
    for i, it in enumerate(subq.items):
        if it.alias is None and not isinstance(it.expr, Col):
            it.alias = f"__sq{i}"
    return subq


def _subquery_values(sf_dir: str, subq) -> tuple[list, bool]:
    """Execute a one-column subquery; return (non-null distinct values,
    had_null). The count guard runs before any driver collection."""
    if len(subq.items) != 1:
        raise SqlError("IN-subquery must select exactly one column")
    ds = _compile_query(sf_dir, _prep_subq(subq))
    n = ds.count()
    if n > SQL_SUBQUERY_MAX:
        raise SqlError(
            f"subquery returned {n} rows (> SQL_SUBQUERY_MAX={SQL_SUBQUERY_MAX}); "
            "aggregate or pre-filter the subquery"
        )
    col = ds.to_pandas().iloc[:, 0]
    has_null = bool(col.isna().any())
    vals = pd.unique(col.dropna())
    return list(vals), has_null


def _decorrelate_exists(node: SubqueryOp, sf_dir: str, outer_q):
    """EXISTS with ONE equality correlation rewrites to the classic
    semi-join form: ``EXISTS(SELECT .. FROM t WHERE t.a = outer.b AND rest)``
    -> ``outer.b IN (SELECT a FROM t WHERE rest)``. The parser drops
    qualifiers, so the correlated side is recognized BY SCHEMA: a column
    that exists in the outer table(s) but not in the subquery's table.
    Uncorrelated EXISTS executes once and folds to a constant predicate."""
    subq = node.query
    if subq.joins:
        raise SqlError("EXISTS subquery must be single-table")
    sub_schema = set(_table_schema_names(sf_dir, subq.table))
    outer_tables = [outer_q.table] + [j.table for j in outer_q.joins]
    outer_schema: set = set()
    for tname in outer_tables:
        outer_schema |= set(_table_schema_names(sf_dir, tname))

    def _outer_col(e):
        return (
            isinstance(e, Col) and e.name not in sub_schema and e.name in outer_schema
        )

    def _inner_col(e):
        return isinstance(e, Col) and e.name in sub_schema

    conjuncts = _split_and(subq.where)
    corr, rest = [], []
    for c in conjuncts:
        if isinstance(c, Cmp) and c.op == "=":
            if _inner_col(c.l) and _outer_col(c.r):
                corr.append((c.l.name, c.r.name))
                continue
            if _inner_col(c.r) and _outer_col(c.l):
                corr.append((c.r.name, c.l.name))
                continue
        rest.append(c)
    if not corr:
        probe = Query(
            [Item(Col(next(iter(sub_schema))), None)], False, subq.table,
            subq.where, [], None, [], 1, 0, subq.table_alias, (),
        )
        n = _compile_query(sf_dir, probe).count()
        return BoolLit(bool(n))
    if len(corr) > 1:
        raise SqlError("EXISTS supports exactly one equality correlation")
    inner_col, outer_col = corr[0]
    inner_q = Query(
        [Item(Col(inner_col), None)], False, subq.table, _and_all(rest),
        [], None, [], None, 0, subq.table_alias, (),
    )
    return SubqueryOp(Col(outer_col), inner_q, "in", False)


def _resolve_subqueries(node, sf_dir: str, outer_q):
    """Pre-compile pass over a WHERE tree: execute/decorrelate every
    SubqueryOp, fold constant predicates out of AND/OR."""
    R = lambda n: _resolve_subqueries(n, sf_dir, outer_q)  # noqa: E731
    if isinstance(node, SubqueryOp):
        if node.kind == "exists":
            return R(_decorrelate_exists(node, sf_dir, outer_q))
        if node.kind == "in":
            vals, has_null = _subquery_values(sf_dir, node.query)
            return InSet(R(node.e), tuple(vals), node.negate, has_null)
        if len(node.query.items) != 1:
            raise SqlError("scalar subquery must select exactly one column")
        rows = _compile_query(sf_dir, _prep_subq(node.query)).limit(2).take_all()
        if len(rows) > 1:
            raise SqlError("scalar subquery returned more than one row")
        if not rows:
            return Lit(None)
        return Lit(next(iter(rows[0].values())))
    if isinstance(node, Logic):
        items = [R(i) for i in node.items]
        if node.op == "and":
            if any(isinstance(i, BoolLit) and not i.val for i in items):
                return BoolLit(False)
            items = [i for i in items if not isinstance(i, BoolLit)]
            return _and_all(items) or BoolLit(True)
        if any(isinstance(i, BoolLit) and i.val for i in items):
            return BoolLit(True)
        items = [i for i in items if not isinstance(i, BoolLit)]
        if not items:
            return BoolLit(False)
        return items[0] if len(items) == 1 else Logic("or", tuple(items))
    if isinstance(node, NotOp):
        e = R(node.e)
        return BoolLit(not e.val) if isinstance(e, BoolLit) else NotOp(e)
    if isinstance(node, Cmp):
        return Cmp(node.op, R(node.l), R(node.r))
    if isinstance(node, Bin):
        return Bin(node.op, R(node.l), R(node.r))
    if isinstance(node, InList):
        return InList(R(node.e), node.vals, node.negate)
    if isinstance(node, LikeOp):
        return LikeOp(R(node.e), node.pattern, node.negate)
    if isinstance(node, IsNullOp):
        return IsNullOp(R(node.e), node.negate)
    if isinstance(node, CastOp):
        return CastOp(R(node.e), node.typ)
    if isinstance(node, Func):
        return Func(node.name, R(node.e))
    if isinstance(node, FuncN):
        return FuncN(node.name, tuple(R(a) for a in node.args))
    if isinstance(node, CaseOp):
        return CaseOp(
            tuple((R(c), R(v)) for c, v in node.whens),
            R(node.default) if node.default is not None else None,
        )
    if isinstance(node, CoalesceOp):
        return CoalesceOp(tuple(R(e) for e in node.items))
    return node


def sql_query(sf_dir: str, sql: str):
    """Parse + compile ``sql`` and return the lazy Ray ``Dataset``.

    Single-table queries against the standard parquet tables in ``sf_dir``
    (the same views the DuckDB oracle sees), so the SQL string itself is
    both the engine input and the oracle."""
    q = parse_sql(sql)
    if isinstance(q, WithQuery):
        _REL_DEFS.append({name: [node, None] for name, node in q.defs})
        try:
            main = q.main
            if isinstance(main, UnionQuery):
                return _compile_union(sf_dir, main)
            return _compile_query(sf_dir, main)
        finally:
            # compile resolved (and materialized) every referenced rel
            # eagerly, so the returned lazy Dataset never needs the frame
            _REL_DEFS.pop()
    if isinstance(q, UnionQuery):
        return _compile_union(sf_dir, q)
    return _compile_query(sf_dir, q)


def _dedupe(ds, names: list[str]):
    """SQL set-distinct over exactly the output columns (same plan as
    SELECT DISTINCT: one groupby, partials combine upstream)."""
    return (
        ds.groupby(names)
        .count()
        .map_batches(lambda t, _n=list(names): t.select(_n), batch_format="pyarrow")
    )


def _compile_union(sf_dir: str, uq: UnionQuery):
    """UNION [ALL] chains folded left-associatively: each branch compiles
    independently (own pruning/filter/aggregate plan), unions lazily
    (block concatenation — no shuffle), and a plain UNION link dedupes the
    accumulated result with ONE groupby. Column names come from the first
    branch; later branches bind positionally (ANSI)."""
    names = [_item_name(it) for it in uq.first.items]
    acc = _compile_query(sf_dir, uq.first)
    for is_all, part in uq.links:
        nxt = _compile_query(sf_dir, part)
        nxt = nxt.map_batches(
            lambda t, _n=list(names): t.rename_columns(_n), batch_format="pyarrow"
        )
        acc = acc.union(nxt)
        if not is_all:
            acc = _dedupe(acc, names)
    if uq.order_by:
        for name, _ in uq.order_by:
            if name not in names:
                raise SqlError(f"ORDER BY {name!r} is not an output column")
        acc = acc.sort(
            [n for n, _ in uq.order_by], descending=[d for _, d in uq.order_by]
        )
    if uq.offset:
        if not uq.order_by or uq.limit is None:
            raise SqlError("OFFSET requires ORDER BY and LIMIT")
        import ray

        page = acc.limit(uq.offset + uq.limit).to_pandas()
        tbl = pa.Table.from_pandas(
            page.iloc[uq.offset :].reset_index(drop=True), preserve_index=False
        )
        return ray.data.from_arrow(tbl)
    if uq.limit is not None:
        acc = acc.limit(uq.limit)
    return acc


def _compile_query(sf_dir: str, q: Query):
    from apache___solr_ray.sources import load

    if q.where is not None:
        w = _resolve_subqueries(q.where, sf_dir, q)
        if isinstance(w, BoolLit) and w.val:
            w = None
        q.where = w

    # -- GROUP BY aliases / expressions -> derived key columns ---------------
    # ``GROUP BY bucket`` (a select alias) or ``GROUP BY floor(x/10)`` (an
    # expression, optionally repeated as an aliased select item) computes
    # the key ONCE per batch into a derived column before the partial
    # stage; matching select items are rewritten to reference it.
    gb_derived: list[tuple[str, object]] = []
    gb_names: list[str] = []
    for i, g in enumerate(q.group_by):
        if isinstance(g, str):
            ali = next(
                (
                    it
                    for it in q.items
                    if it.alias == g and not isinstance(it.expr, Col)
                ),
                None,
            )
            if ali is not None:
                gb_derived.append((g, ali.expr))
                ali.expr = Col(g)
            gb_names.append(g)
            continue
        match = next((it for it in q.items if it.expr == g), None)
        if match is not None:
            if match.alias is None:
                raise SqlError(
                    "a GROUP BY expression repeated in SELECT needs an alias"
                )
            name = match.alias
            match.expr = Col(name)
        else:
            name = f"__g{i}"
        gb_derived.append((name, g))
        gb_names.append(name)
    q.group_by = gb_names

    # -- referenced-column pruning (SolrProject push-down) -------------------
    cols: set[str] = set()
    aggs: list[Agg] = []
    for it in q.items:
        _walk(it.expr, cols, aggs)
    _walk(q.where, cols, [])  # aggregates are illegal in WHERE
    if q.having is not None:
        _walk(q.having, cols, aggs)
    for name, e in gb_derived:
        bad: list = []
        _walk(e, cols, bad)
        if bad:
            raise SqlError("aggregates are illegal in GROUP BY expressions")
    derived_names = {name for name, _ in gb_derived}
    for g in q.group_by:
        cols.add(g)
    cols -= derived_names  # derived keys are computed, not scanned
    if not cols:
        if aggs:
            # SELECT count(*) with no referenced columns: scan one schema
            # column for row counting (narrowest possible read)
            cols.add(_table_schema_names(sf_dir, q.table)[0])
        else:
            raise SqlError("query references no columns")
    if q.joins:
        ds = _compile_join(sf_dir, q, cols)
    else:
        ds = _load_rel(sf_dir, q.table, columns=sorted(cols))

    # -- WHERE (SolrFilter push-down): one vectorized mask per batch ---------
    if q.where is not None:
        w = q.where

        def flt(t: pa.Table, _w=w) -> pa.Table:
            return t.filter(_eval(_w, t))

        ds = ds.map_batches(flt, batch_format="pyarrow")

    if gb_derived:
        gpairs = tuple(gb_derived)

        def derive_keys(t: pa.Table, _p=gpairs) -> pa.Table:
            for nm, e in _p:
                t = t.append_column(nm, _as_array(_eval(e, t), t.num_rows))
            return t

        ds = ds.map_batches(derive_keys, batch_format="pyarrow")

    if aggs or q.group_by:
        # validate: outside aggregate arguments, only group-by columns may
        # be referenced (standard SQL grouping rule)
        gset = set(q.group_by)
        for it in q.items:
            bare: set[str] = set()
            _bare_cols(it.expr, bare)
            if bare - gset:
                raise SqlError(
                    f"column(s) {sorted(bare - gset)} must appear in GROUP BY "
                    "or inside an aggregate"
                )
        if q.having is not None:
            bare = set()
            _bare_cols(q.having, bare)
            if bare - gset:
                raise SqlError(f"HAVING references non-grouped column(s) {sorted(bare - gset)}")
        # computed-expression aggregates (sum(CASE WHEN ...), avg(a*b)):
        # evaluate each expression ONCE per batch into a derived column so
        # the partial stage aggregates plain columns
        expr_aggs = [(i, a) for i, a in enumerate(aggs) if a.expr is not None]
        aggs_exec = list(aggs)
        if expr_aggs:
            pairs = tuple((f"__ax{i}", a.expr) for i, a in expr_aggs)

            def derive(t: pa.Table, _p=pairs) -> pa.Table:
                for nm, e in _p:
                    t = t.append_column(nm, _as_array(_eval(e, t), t.num_rows))
                return t

            ds = ds.map_batches(derive, batch_format="pyarrow")
            for i, a in expr_aggs:
                aggs_exec[i] = Agg(a.func, f"__ax{i}")
        ds = _aggregate(ds, q, aggs_exec)
        agg_name = {a: _agg_internal_name(i) for i, a in enumerate(aggs)}
    else:
        agg_name = None
        if q.having is not None:
            raise SqlError("HAVING requires GROUP BY / aggregates")

    # -- HAVING: mask over the finished aggregate table ----------------------
    if q.having is not None:
        h = q.having

        def hav(t: pa.Table, _h=h, _an=agg_name) -> pa.Table:
            return t.filter(_eval(_h, t, _an))

        ds = ds.map_batches(hav, batch_format="pyarrow")

    # -- final projection -----------------------------------------------------
    items = [(it, _item_name(it)) for it in q.items]
    names = [n for _, n in items]
    if len(set(names)) != len(names):
        raise SqlError(f"duplicate output column names: {names}")

    def project(t: pa.Table, _items=items, _an=agg_name) -> pa.Table:
        arrs = {n: _as_array(_eval(it.expr, t, _an), t.num_rows) for it, n in _items}
        return pa.table(arrs)

    ds = ds.map_batches(project, batch_format="pyarrow")

    # -- DISTINCT: dedup via groupby over the projected columns --------------
    if q.distinct:
        ds = (
            ds.groupby(names)
            .count()
            .map_batches(
                lambda t, _n=list(names): t.select(_n), batch_format="pyarrow"
            )
        )

    # -- ORDER BY / LIMIT (SolrSort push-down) --------------------------------
    if q.order_by:
        for name, _ in q.order_by:
            if name not in names:
                raise SqlError(f"ORDER BY {name!r} is not an output column")
        ds = ds.sort([n for n, _ in q.order_by], descending=[d for _, d in q.order_by])
    if q.offset:
        # OFFSET needs a total order to be meaningful, and the page is
        # small by construction (user-bounded limit+offset): take the
        # first offset+limit rows in sorted order and slice the page
        if not q.order_by:
            raise SqlError("OFFSET requires ORDER BY")
        if q.limit is None:
            raise SqlError("OFFSET requires LIMIT")
        import ray

        page = ds.limit(q.offset + q.limit).to_pandas()
        tbl = pa.Table.from_pandas(
            page.iloc[q.offset :].reset_index(drop=True), preserve_index=False
        )
        # keep the documented contract: every path returns a lazy Dataset
        # (jobs/sql_job.py calls .limit/.write_parquet on the result)
        return ray.data.from_arrow(tbl)
    if q.limit is not None:
        ds = ds.limit(q.limit)
    return ds


# ---------------------------------------------------------------------------
# Aggregation (SolrAggregate push-down): per-batch pandas partials + ONE
# groupby over partials. avg is carried as (sum, count) and finished after
# the shuffle; count(col) counts non-nulls, count(*) counts rows.
# ---------------------------------------------------------------------------


def _agg_internal_name(i: int) -> str:
    return f"__a{i}"


def _final_fns(aggs: list[Agg]):
    """ray.data aggregate fns combining the partial layout post-shuffle,
    plus the equivalent pandas combine spec (sum/min/max column lists)
    for the driver-side fast path."""
    from ray.data.aggregate import Max, Min, Sum

    fns = []
    sum_cols: list[str] = []
    min_cols: list[str] = []
    max_cols: list[str] = []
    for i, a in enumerate(aggs):
        nm = _agg_internal_name(i)
        if a.func in ("count", "count_distinct"):
            fns.append(Sum(nm + "_n", alias_name=nm + "_n"))
            sum_cols.append(nm + "_n")
        elif a.func == "sum":
            fns.append(Sum(nm + "_s", alias_name=nm + "_s"))
            sum_cols.append(nm + "_s")
        elif a.func == "avg":
            fns.append(Sum(nm + "_s", alias_name=nm + "_s"))
            fns.append(Sum(nm + "_n", alias_name=nm + "_n"))
            sum_cols += [nm + "_s", nm + "_n"]
        elif a.func in ("stddev", "variance"):
            fns.append(Sum(nm + "_s", alias_name=nm + "_s"))
            fns.append(Sum(nm + "_q", alias_name=nm + "_q"))
            fns.append(Sum(nm + "_n", alias_name=nm + "_n"))
            sum_cols += [nm + "_s", nm + "_q", nm + "_n"]
        elif a.func == "min":
            fns.append(Min(nm + "_m", alias_name=nm + "_m"))
            min_cols.append(nm + "_m")
        else:
            fns.append(Max(nm + "_m", alias_name=nm + "_m"))
            max_cols.append(nm + "_m")
    return fns, (sum_cols, min_cols, max_cols)


def _finish_fn(aggs: list[Agg], group_by: list[str]):
    def finish(t: pa.Table, _aggs=tuple(aggs), _keys=tuple(group_by)) -> pa.Table:
        cols = {k: t.column(k) for k in _keys}
        for i, a in enumerate(_aggs):
            nm = _agg_internal_name(i)
            if a.func in ("count", "count_distinct"):
                cols[nm] = t.column(nm + "_n").cast(pa.int64())
            elif a.func == "sum":
                cols[nm] = t.column(nm + "_s")
            elif a.func == "avg":
                cols[nm] = pc.divide(
                    pc.cast(t.column(nm + "_s"), pa.float64()),
                    pc.cast(t.column(nm + "_n"), pa.float64()),
                )
            elif a.func in ("stddev", "variance"):
                s = pc.cast(t.column(nm + "_s"), pa.float64())
                qq = pc.cast(t.column(nm + "_q"), pa.float64())
                n = pc.cast(t.column(nm + "_n"), pa.float64())
                var = pc.divide(
                    pc.subtract(qq, pc.divide(pc.multiply(s, s), n)),
                    pc.subtract(n, 1.0),
                )
                # sample variance is null for n <= 1 (DuckDB semantics)
                var = pc.if_else(pc.greater(n, 1.0), var, pa.scalar(None, pa.float64()))
                cols[nm] = pc.sqrt(var) if a.func == "stddev" else var
            else:
                cols[nm] = t.column(nm + "_m")
        if not cols:
            raise SqlError("empty aggregate output")
        return pa.table(cols)

    return finish


def _identity_agg_table(aggs: list[Agg]) -> pa.Table:
    """SQL's zero-input global aggregate row: a global aggregate (no GROUP
    BY) over zero rows yields exactly ONE row — count()/count(DISTINCT)=0,
    every other aggregate NULL (the DuckDB-oracle contract)."""
    cols = {}
    for i, a in enumerate(aggs):
        nm = _agg_internal_name(i)
        if a.func in ("count", "count_distinct"):
            cols[nm] = pa.array([0], pa.int64())
        else:
            cols[nm] = pa.array([None], pa.float64())
    return pa.table(cols)


def _finish_or_identity(agg_ds, q: Query, aggs: list[Agg], synthetic_key: bool):
    """Finish the combined partials; for the synthetic-key (global) case,
    materialize first (the output is at most one row, so this is free) and
    emit the identity row when WHERE filtered out every input row."""
    if synthetic_key:
        import ray

        agg_ds = agg_ds.materialize()
        if agg_ds.count() == 0:
            return ray.data.from_arrow(_identity_agg_table(aggs))
    return agg_ds.map_batches(_finish_fn(aggs, q.group_by), batch_format="pyarrow")


def _aggregate(ds, q: Query, aggs: list[Agg]):
    dist_cols = {a.col for a in aggs if a.func == "count_distinct"}
    if len(dist_cols) > 1:
        raise SqlError(
            "multiple COUNT(DISTINCT ...) columns in one query are unsupported "
            "(the two-level rewrite needs a single distinct column)"
        )
    if dist_cols:
        return _aggregate_with_distinct(ds, q, aggs, dist_cols.pop())

    keys = list(q.group_by)
    synthetic_key = not keys
    if synthetic_key:
        keys = ["__g"]

    # partial layout per agg i: sum/avg -> __a{i}_s (+ __a{i}_n for avg);
    # count -> __a{i}_n; min/max -> __a{i}_m; stddev/variance ->
    # (sum, sum-of-squares, count) finished as (q - s^2/n)/(n-1)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if synthetic_key:
            df = df.assign(__g=np.int64(0))
        for i, a in enumerate(aggs):
            if a.func in ("stddev", "variance"):
                df = df.assign(
                    **{f"__sq{i}": df[a.col].astype(np.float64) ** 2}
                )
        gb = df.groupby(keys, dropna=False, sort=False)
        out = {}
        for i, a in enumerate(aggs):
            nm = _agg_internal_name(i)
            if a.func == "count":
                out[nm + "_n"] = gb.size() if a.col is None else gb[a.col].count()
            elif a.func == "sum":
                out[nm + "_s"] = gb[a.col].sum(min_count=1)
            elif a.func == "avg":
                out[nm + "_s"] = gb[a.col].sum(min_count=1)
                out[nm + "_n"] = gb[a.col].count()
            elif a.func in ("stddev", "variance"):
                out[nm + "_s"] = gb[a.col].sum(min_count=1).astype(np.float64)
                out[nm + "_q"] = gb[f"__sq{i}"].sum(min_count=1)
                out[nm + "_n"] = gb[a.col].count()
            else:  # min / max
                out[nm + "_m"] = getattr(gb[a.col], a.func)()
        if not out:  # GROUP BY with no aggregates (DISTINCT-like)
            out["__one"] = gb.size()
        # emit ARROW blocks: Ray's hash aggregate is ~9x slower consuming
        # pandas blocks (measured 8.2s vs 0.8s on the same partials)
        return pa.Table.from_pandas(
            pd.DataFrame(out).reset_index(), preserve_index=False
        )

    parts = ds.map_batches(partial, batch_format="pandas")
    fns, (sum_cols, min_cols, max_cols) = _final_fns(aggs)
    if not fns:
        from ray.data.aggregate import Sum

        fns.append(Sum("__one", alias_name="__one"))
        sum_cols = ["__one"]
    from apache___solr_ray.pipelines.common import combine_partials

    agg_ds = combine_partials(parts, keys, fns, sum_cols, min_cols, max_cols)
    return _finish_or_identity(agg_ds, q, aggs, synthetic_key)


def _aggregate_with_distinct(ds, q: Query, aggs: list[Agg], dcol: str):
    """COUNT(DISTINCT dcol) via the standard two-level rewrite (the Spark
    single-distinct plan): LEVEL 1 aggregates the regular aggs' partials
    grouped by (keys, dcol) — one global shuffle on the expanded key, one
    row per distinct pair; LEVEL 2 re-partials those rows by keys —
    count-distinct = count of non-null dcol rows, regular partials compose
    associatively (sum of sums, min of mins, avg/stddev carried as
    components). Nulls in dcol form a level-1 group so regular aggs see
    every row, but count() skips them (DuckDB semantics)."""
    import pandas as pd

    if dcol in q.group_by:
        raise SqlError(f"COUNT(DISTINCT {dcol}) with {dcol} in GROUP BY is degenerate")
    keys = list(q.group_by)
    synthetic_key = not keys
    if synthetic_key:
        keys = ["__g"]
    reg = [(i, a) for i, a in enumerate(aggs) if a.func != "count_distinct"]

    def partial1(df: pd.DataFrame) -> pd.DataFrame:
        if synthetic_key:
            df = df.assign(__g=np.int64(0))
        for i, a in reg:
            if a.func in ("stddev", "variance"):
                df = df.assign(**{f"__sq{i}": df[a.col].astype(np.float64) ** 2})
        gb = df.groupby(keys + [dcol], dropna=False, sort=False)
        out = {}
        for i, a in reg:
            nm = _agg_internal_name(i)
            if a.func == "count":
                out[nm + "_n"] = gb.size() if a.col is None else gb[a.col].count()
            elif a.func == "sum":
                out[nm + "_s"] = gb[a.col].sum(min_count=1)
            elif a.func == "avg":
                out[nm + "_s"] = gb[a.col].sum(min_count=1)
                out[nm + "_n"] = gb[a.col].count()
            elif a.func in ("stddev", "variance"):
                out[nm + "_s"] = gb[a.col].sum(min_count=1).astype(np.float64)
                out[nm + "_q"] = gb[f"__sq{i}"].sum(min_count=1)
                out[nm + "_n"] = gb[a.col].count()
            else:
                out[nm + "_m"] = getattr(gb[a.col], a.func)()
        if not out:
            out["__one"] = gb.size()
        # emit ARROW blocks: Ray's hash aggregate is ~9x slower consuming
        # pandas blocks (measured 8.2s vs 0.8s on the same partials)
        return pa.Table.from_pandas(
            pd.DataFrame(out).reset_index(), preserve_index=False
        )

    # level-1 combine fns, keyed by each agg's TRUE index (not 0-based)
    fns1 = []
    s1: list[str] = []
    m1: list[str] = []
    x1: list[str] = []
    from ray.data.aggregate import Max, Min, Sum

    for i, a in reg:
        nm = _agg_internal_name(i)
        if a.func == "count":
            fns1.append(Sum(nm + "_n", alias_name=nm + "_n"))
            s1.append(nm + "_n")
        elif a.func == "sum":
            fns1.append(Sum(nm + "_s", alias_name=nm + "_s"))
            s1.append(nm + "_s")
        elif a.func == "avg":
            fns1.append(Sum(nm + "_s", alias_name=nm + "_s"))
            fns1.append(Sum(nm + "_n", alias_name=nm + "_n"))
            s1 += [nm + "_s", nm + "_n"]
        elif a.func in ("stddev", "variance"):
            fns1.append(Sum(nm + "_s", alias_name=nm + "_s"))
            fns1.append(Sum(nm + "_q", alias_name=nm + "_q"))
            fns1.append(Sum(nm + "_n", alias_name=nm + "_n"))
            s1 += [nm + "_s", nm + "_q", nm + "_n"]
        elif a.func == "min":
            fns1.append(Min(nm + "_m", alias_name=nm + "_m"))
            m1.append(nm + "_m")
        else:
            fns1.append(Max(nm + "_m", alias_name=nm + "_m"))
            x1.append(nm + "_m")
    if not fns1:
        fns1.append(Sum("__one", alias_name="__one"))
        s1 = ["__one"]
    from apache___solr_ray.pipelines.common import combine_partials

    level1 = combine_partials(
        ds.map_batches(partial1, batch_format="pandas"), keys + [dcol], fns1, s1, m1, x1
    )

    def partial2(df: pd.DataFrame) -> pd.DataFrame:
        gb = df.groupby(keys, dropna=False, sort=False)
        out = {}
        for i, a in enumerate(aggs):
            nm = _agg_internal_name(i)
            if a.func == "count_distinct":
                out[nm + "_n"] = gb[dcol].count()  # non-null distinct values
            elif a.func == "count":
                out[nm + "_n"] = gb[nm + "_n"].sum()
            elif a.func == "sum":
                out[nm + "_s"] = gb[nm + "_s"].sum(min_count=1)
            elif a.func == "avg":
                out[nm + "_s"] = gb[nm + "_s"].sum(min_count=1)
                out[nm + "_n"] = gb[nm + "_n"].sum()
            elif a.func in ("stddev", "variance"):
                out[nm + "_s"] = gb[nm + "_s"].sum(min_count=1)
                out[nm + "_q"] = gb[nm + "_q"].sum(min_count=1)
                out[nm + "_n"] = gb[nm + "_n"].sum()
            elif a.func == "min":
                out[nm + "_m"] = gb[nm + "_m"].min()
            else:
                out[nm + "_m"] = gb[nm + "_m"].max()
        # emit ARROW blocks: Ray's hash aggregate is ~9x slower consuming
        # pandas blocks (measured 8.2s vs 0.8s on the same partials)
        return pa.Table.from_pandas(
            pd.DataFrame(out).reset_index(), preserve_index=False
        )

    fns2, (s2, m2, x2) = _final_fns(aggs)
    agg_ds = combine_partials(
        level1.map_batches(partial2, batch_format="pandas"), keys, fns2, s2, m2, x2
    )
    return _finish_or_identity(agg_ds, q, aggs, synthetic_key)
