"""Solr date-math expressions (reference
solr/solrj/src/java/org/apache/solr/util/DateMathParser.java: the
``NOW/DAY-7DAYS``-style mini-language used by every date-typed query,
range facet gap and TTL in the reference — javadoc at the top of that
file defines the grammar: an anchor (``NOW`` or an ISO-8601 instant
followed by ``Z``), then any sequence of ``/UNIT`` (round down),
``+N UNIT`` and ``-N UNIT`` operations applied LEFT TO RIGHT).

Semantics matched to the reference:

- rounding ``/UNIT`` zeroes every field finer than UNIT (``/DAY`` →
  midnight, ``/MONTH`` → 1st at midnight, ``/YEAR`` → Jan 1);
- month arithmetic clamps the day-of-month like ``Calendar.add`` (Jan 31
  ``+1MONTH`` → Feb 29/28) — the same convention DuckDB's
  ``+ INTERVAL n MONTH`` uses, so oracles can mirror expressions in SQL;
- ``NOW`` is an explicit parameter, never the wall clock (the reference
  forces a shared ``NOW=`` across a distributed request for exactly this
  determinism reason — SolrRequestInfo.getNOW()).

Pure Python on ``datetime`` (microsecond precision, like the engine's
``timestamp[us]`` columns); vectorized use sites resolve the expression
ONCE to a concrete bound and push it into an Arrow comparison kernel.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

__all__ = ["parse_date_math", "DateMathError"]


class DateMathError(ValueError):
    pass


_UNIT = {
    "YEAR": "year",
    "YEARS": "year",
    "MONTH": "month",
    "MONTHS": "month",
    "DAY": "day",
    "DAYS": "day",
    "DATE": "day",
    "HOUR": "hour",
    "HOURS": "hour",
    "MINUTE": "minute",
    "MINUTES": "minute",
    "SECOND": "second",
    "SECONDS": "second",
    "MILLI": "milli",
    "MILLIS": "milli",
    "MILLISECOND": "milli",
    "MILLISECONDS": "milli",
}

_OP_RE = re.compile(r"([+\-/])|(\d+)|([A-Z]+)")
_ANCHOR_RE = re.compile(
    r"^(NOW|\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?Z)"
)


def _round_down(t: datetime, unit: str) -> datetime:
    if unit == "milli":
        return t.replace(microsecond=(t.microsecond // 1000) * 1000)
    if unit == "second":
        return t.replace(microsecond=0)
    if unit == "minute":
        return t.replace(second=0, microsecond=0)
    if unit == "hour":
        return t.replace(minute=0, second=0, microsecond=0)
    if unit == "day":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "month":
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "year":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    raise DateMathError(f"cannot round to {unit!r}")


def _add(t: datetime, n: int, unit: str) -> datetime:
    if unit == "milli":
        return t + timedelta(milliseconds=n)
    if unit == "second":
        return t + timedelta(seconds=n)
    if unit == "minute":
        return t + timedelta(minutes=n)
    if unit == "hour":
        return t + timedelta(hours=n)
    if unit == "day":
        return t + timedelta(days=n)
    if unit == "month":
        # Calendar.add semantics: move month, clamp day-of-month
        m = t.year * 12 + (t.month - 1) + n
        y, mo = divmod(m, 12)
        day = min(t.day, calendar.monthrange(y, mo + 1)[1])
        return t.replace(year=y, month=mo + 1, day=day)
    if unit == "year":
        y = t.year + n
        day = min(t.day, calendar.monthrange(y, t.month)[1])
        return t.replace(year=y, day=day)
    raise DateMathError(f"unknown unit {unit!r}")


def parse_date_math(expr: str, now: datetime) -> datetime:
    """Evaluate a Solr date-math string against an explicit ``now``.

    ``parse_date_math("NOW/DAY-7DAYS", now)`` — anchor first (``NOW`` or
    an ISO instant with trailing ``Z``), then ops left to right.
    """
    expr = expr.strip()
    m = _ANCHOR_RE.match(expr)
    if not m:
        raise DateMathError(f"bad date-math anchor in {expr!r}")
    anchor = m.group(1)
    if anchor == "NOW":
        t = now
    else:
        t = datetime.strptime(
            anchor, "%Y-%m-%dT%H:%M:%S.%fZ" if "." in anchor else "%Y-%m-%dT%H:%M:%SZ"
        )
    rest = expr[m.end() :]
    toks = [x for tup in _OP_RE.findall(rest) for x in tup if x]
    if "".join(toks) != rest.replace(" ", ""):
        raise DateMathError(f"unparsed characters in {expr!r}")
    i = 0
    while i < len(toks):
        op = toks[i]
        if op == "/":
            if i + 1 >= len(toks) or toks[i + 1] not in _UNIT:
                raise DateMathError(f"bad rounding unit in {expr!r}")
            t = _round_down(t, _UNIT[toks[i + 1]])
            i += 2
        elif op in "+-":
            if (
                i + 2 >= len(toks)
                or not toks[i + 1].isdigit()
                or toks[i + 2] not in _UNIT
            ):
                raise DateMathError(f"bad arithmetic op in {expr!r}")
            n = int(toks[i + 1]) * (1 if op == "+" else -1)
            t = _add(t, n, _UNIT[toks[i + 2]])
            i += 3
        else:
            raise DateMathError(f"expected op at {op!r} in {expr!r}")
    return t
