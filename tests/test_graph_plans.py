"""gatherNodes adaptive frontier plans: the broadcast (small-frontier) and
distributed hash-semi-join (large-frontier) physical plans must be
result-identical — the distributed plan is forced by dropping the
threshold to 0."""

import duckdb

from apache___solr_ray.pipelines import graph

SF = "/root/testdata/sf0.001"


def _run():
    return (
        graph.QUERIES["graph_gather_nodes"](SF)
        .to_pandas()
        .sort_values(["level", "node"])
        .reset_index(drop=True)
    )


def test_gather_nodes_distributed_plan_equals_broadcast(ray_session):
    base = _run()
    old = graph.FRONTIER_BROADCAST_MAX
    graph.FRONTIER_BROADCAST_MAX = 0  # force the hash-semi-join plan
    try:
        dist = _run()
    finally:
        graph.FRONTIER_BROADCAST_MAX = old
    assert base.equals(dist)

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = (
        con.execute(graph.ORACLE["graph_gather_nodes"])
        .df()
        .sort_values(["level", "node"])
        .reset_index(drop=True)
    )
    assert base["node"].tolist() == want["node"].tolist()
    assert base["level"].tolist() == want["level"].tolist()
