"""Streaming-expression front-end: parser shapes, compile errors, and a
cross-check that hashJoin (build-side form) equals innerJoin."""

import pytest

from apache___solr_ray.streamexpr import (
    Node,
    StreamExprError,
    parse_stream_expr,
    stream_expr,
)

SF = "/root/testdata/sf0.001"


def test_parser_shapes():
    n = parse_stream_expr(
        'rollup(search(events, q="*:*", fl="a,b"), over="a", sum(b), count(*))'
    )
    assert n.name == "rollup" and n.params["over"] == "a"
    assert isinstance(n.args[0], Node) and n.args[0].name == "search"
    assert n.args[0].params["q"] == "*:*"
    assert [a.name for a in n.args[1:]] == ["sum", "count"]
    assert n.args[2].args == ["*"]
    # escaped quotes in string params
    n2 = parse_stream_expr('search(t, q="a:\\"x\\"", fl="a")')
    assert n2.params["q"] == 'a:"x"'


def test_parse_errors():
    with pytest.raises(StreamExprError):
        parse_stream_expr("rollup(")
    with pytest.raises(StreamExprError):
        parse_stream_expr("rollup(a b)")
    with pytest.raises(StreamExprError):
        stream_expr(SF, 'frobnicate(search(events, q="*:*", fl="event_id"))')


def test_compile_errors(ray_session):
    # search without fl
    with pytest.raises(StreamExprError):
        stream_expr(SF, 'search(events, q="*:*")')
    # unique without a declared sort on the inner stream
    with pytest.raises(StreamExprError):
        stream_expr(
            SF, 'unique(search(events, q="*:*", fl="user_id"), over="user_id")'
        )
    # top without sort
    with pytest.raises(StreamExprError):
        stream_expr(SF, 'top(search(events, q="*:*", fl="event_id"), n=3)')
    # unsupported q syntax
    with pytest.raises(StreamExprError):
        stream_expr(SF, 'search(events, q="a:b AND c:d", fl="event_id")')


def test_hashjoin_equals_innerjoin(ray_session):
    inner = stream_expr(
        SF,
        'innerJoin(search(customer, q="*:*", fl="c_custkey,c_name"), '
        'search(orders, q="*:*", fl="o_orderkey,o_custkey"), on="c_custkey=o_custkey")',
    ).to_pandas()
    hashed = stream_expr(
        SF,
        'hashJoin(search(customer, q="*:*", fl="c_custkey,c_name"), '
        'hashed=search(orders, q="*:*", fl="o_orderkey,o_custkey"), on="c_custkey=o_custkey")',
    ).to_pandas()
    import pandas as pd

    key = ["c_custkey", "o_orderkey"]
    pd.testing.assert_frame_equal(
        inner.sort_values(key).reset_index(drop=True),
        hashed[inner.columns].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(inner) > 0


def test_range_query_filter(ray_session):
    df = stream_expr(
        SF, 'search(events, q="value:[10 TO 20]", fl="event_id,value")'
    ).to_pandas()
    assert len(df) > 0
    assert df["value"].between(10, 20).all()


def test_hashed_side_guard_before_collect(ray_session, monkeypatch):
    """An over-limit hashed side must raise from the metadata-count check
    BEFORE any to_pandas() driver collection (ADVICE r4: the old order
    could OOM the driver before the guard fired)."""
    import apache___solr_ray.streamexpr as se

    monkeypatch.setattr(se, "HASHED_SIDE_MAX", 3)
    with pytest.raises(StreamExprError, match="HASHED_SIDE_MAX|rows"):
        stream_expr(
            SF,
            'hashJoin(search(events, q="*:*", fl="user_id,event_id"), '
            'hashed=search(customer, q="*:*", fl="c_custkey,c_name"), '
            'on="user_id=c_custkey")',
        )


def test_set_op_guard_before_collect(ray_session, monkeypatch):
    """intersect()/complement() size-check the distinct-key table via
    count() before collecting it."""
    import apache___solr_ray.streamexpr as se

    monkeypatch.setattr(se, "HASHED_SIDE_MAX", 2)
    with pytest.raises(StreamExprError, match="distinct keys"):
        stream_expr(
            SF,
            'intersect(search(events, q="*:*", fl="user_id,event_id"), '
            'search(customer, q="*:*", fl="c_custkey"), on="user_id=c_custkey")',
        )
