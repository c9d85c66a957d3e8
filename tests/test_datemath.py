"""DateMathParser semantics (reference DateMathParser.java grammar:
anchor + left-to-right /round, +N, -N ops; month arithmetic clamps the
day-of-month like Calendar.add)."""

from datetime import datetime

import pytest

from apache___solr_ray.datemath import DateMathError, parse_date_math

NOW = datetime(2024, 1, 25, 13, 37, 42, 123456)


def test_anchor_now_identity():
    assert parse_date_math("NOW", NOW) == NOW


def test_round_day_hour_minute_year():
    assert parse_date_math("NOW/DAY", NOW) == datetime(2024, 1, 25)
    assert parse_date_math("NOW/HOUR", NOW) == datetime(2024, 1, 25, 13)
    assert parse_date_math("NOW/MINUTE", NOW) == datetime(2024, 1, 25, 13, 37)
    assert parse_date_math("NOW/YEAR", NOW) == datetime(2024, 1, 1)
    assert parse_date_math("NOW/MONTH", NOW) == datetime(2024, 1, 1)
    assert parse_date_math("NOW/MILLI", NOW) == datetime(
        2024, 1, 25, 13, 37, 42, 123000
    )


def test_ops_left_to_right_order_matters():
    # round then shift != shift then round
    assert parse_date_math("NOW/DAY-7DAYS", NOW) == datetime(2024, 1, 18)
    assert parse_date_math("NOW-7DAYS/DAY", NOW) == datetime(2024, 1, 18)
    assert parse_date_math("NOW/HOUR+30MINUTES", NOW) == datetime(
        2024, 1, 25, 13, 30
    )
    assert parse_date_math("NOW+30MINUTES/HOUR", NOW) == datetime(2024, 1, 25, 14)


def test_month_arithmetic_clamps_day():
    jan31 = datetime(2024, 1, 31, 6, 0, 0)
    assert parse_date_math("NOW+1MONTH", jan31) == datetime(2024, 2, 29, 6)  # leap
    assert parse_date_math("NOW+1MONTH", datetime(2023, 1, 31)) == datetime(2023, 2, 28)
    assert parse_date_math("NOW-1MONTH", datetime(2024, 3, 31)) == datetime(2024, 2, 29)
    assert parse_date_math("NOW+13MONTHS", datetime(2024, 1, 31)) == datetime(
        2025, 2, 28
    )


def test_year_arithmetic_clamps_leap_day():
    assert parse_date_math("NOW+1YEAR", datetime(2024, 2, 29)) == datetime(2025, 2, 28)


def test_explicit_anchor_instant():
    assert parse_date_math("2024-03-15T12:00:00Z/DAY+6HOURS", NOW) == datetime(
        2024, 3, 15, 6
    )
    assert parse_date_math("2024-03-15T12:00:00.250000Z/SECOND", NOW) == datetime(
        2024, 3, 15, 12
    )


def test_chained_expression():
    got = parse_date_math("NOW/YEAR+2MONTHS+10DAYS/DAY+90MINUTES", NOW)
    assert got == datetime(2024, 3, 11, 1, 30)


@pytest.mark.parametrize(
    "bad",
    ["TOMORROW", "NOW/", "NOW+DAYS", "NOW+3", "NOW/FORTNIGHT", "NOW 3DAYS", "NOW+3days"],
)
def test_bad_expressions_raise(bad):
    with pytest.raises(DateMathError):
        parse_date_math(bad, NOW)


def test_datemath_random_chains_match_duckdb():
    """Property check: random op chains must match DuckDB's date_trunc /
    INTERVAL arithmetic op-for-op (both clamp day-of-month on month/year
    shifts), across 300 seeded cases."""
    import random

    import duckdb

    rng = random.Random(20240819)
    con = duckdb.connect()
    units_sql = {"DAY": "day", "HOUR": "hour", "MINUTE": "minute",
                 "MONTH": "month", "YEAR": "year", "SECOND": "second"}
    for _ in range(300):
        y, mo = rng.randint(2020, 2026), rng.randint(1, 12)
        d = rng.randint(1, 28 if mo == 2 else 30)
        anchor = datetime(y, mo, d, rng.randint(0, 23), rng.randint(0, 59),
                          rng.randint(0, 59))
        expr_parts, sql = [], f"TIMESTAMP '{anchor.isoformat(sep=' ')}'"
        for _ in range(rng.randint(1, 4)):
            u = rng.choice(list(units_sql))
            if rng.random() < 0.4:
                expr_parts.append(f"/{u}")
                sql = f"date_trunc('{units_sql[u]}', {sql})"
            else:
                n = rng.randint(1, 30)
                op = rng.choice("+-")
                expr_parts.append(f"{op}{n}{u}S")
                sql = f"({sql} {op} INTERVAL {n} {units_sql[u]})"
        got = parse_date_math("NOW" + "".join(expr_parts), anchor)
        want = con.execute(f"SELECT CAST({sql} AS TIMESTAMP)").fetchone()[0]
        assert got == want, ("NOW" + "".join(expr_parts), anchor, got, want)
