"""Adaptive physical plans must be result-identical across their
broadcast (small-side) and distributed/bucketed (scale) forms:

- graph_shortest_path: driver-frontier BFS vs fully-distributed rounds
  (_bfs_rounds_distributed — Dataset frontier/visited, groupby-min
  anti-join);
- asof_last_purchase_before_click: broadcast build side vs bucketed
  pd.merge_asof after one user_id hash co-location.
"""

import pandas as pd

from apache___solr_ray.pipelines import graph, relational

SF = "/root/testdata/sf0.001"


def _norm(res, cols):
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    return df.sort_values(cols).reset_index(drop=True)


def test_bfs_distributed_plan_equals_driver(ray_session):
    base = _norm(graph.graph_shortest_path(SF, plan="driver"), ["node"])
    dist = _norm(graph.graph_shortest_path(SF, plan="distributed"), ["node"])
    assert base["node"].tolist() == dist["node"].tolist()
    assert base["dist"].tolist() == dist["dist"].tolist()
    assert len(base) > 1  # the seed actually reached something


def test_bfs_auto_spills_to_distributed(ray_session, monkeypatch):
    """With the threshold forced to 0, the auto plan must hand round 0 to
    the distributed continuation immediately after the seed round — and
    still produce the driver-plan result."""
    base = _norm(graph.graph_shortest_path(SF, plan="driver"), ["node"])
    monkeypatch.setattr(graph, "FRONTIER_BROADCAST_MAX", 1)
    # NB: _hop also reads FRONTIER_BROADCAST_MAX — with 1 it takes the
    # hash-semi-join branch for every hop, exercising the join path too.
    dist = _norm(graph.graph_shortest_path(SF, plan="auto"), ["node"])
    assert base["node"].tolist() == dist["node"].tolist()
    assert base["dist"].tolist() == dist["dist"].tolist()


def test_asof_bucketed_plan_equals_broadcast(ray_session):
    base = _norm(
        relational.asof_last_purchase_before_click(SF, plan="broadcast"),
        ["event_id"],
    )
    buck = _norm(
        relational.asof_last_purchase_before_click(SF, plan="bucketed"),
        ["event_id"],
    )
    assert base["event_id"].tolist() == buck["event_id"].tolist()
    assert base["last_purchase_ts"].fillna(pd.Timestamp(0)).tolist() == buck[
        "last_purchase_ts"
    ].fillna(pd.Timestamp(0)).tolist()
    assert base["last_purchase_ts"].notna().sum() > 0
