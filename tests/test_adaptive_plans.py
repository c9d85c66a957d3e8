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


def _join_fixture():
    import ray

    l = ray.data.from_items(
        [{"k": i, "x": i * 10} for i in range(1, 7)]  # keys 1..6
    )
    r = ray.data.from_items(
        [{"j": i, "y": i * 100} for i in range(4, 10)]  # keys 4..9
    )
    return l, r


def _join_norm(ds):
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return (
        df.sort_values(list(df.columns)).reset_index(drop=True).fillna(-1).astype(int)
    )


def test_cogroup_join_matches_native_join(ray_session):
    """cogroup_join is the race-free fallback behind native_join — its
    output (schema and rows, right key coalesced into the left key's
    column) must be identical to Ray's Dataset.join for every join type."""
    from apache___solr_ray.pipelines.common import cogroup_join, native_join

    for jt, how in [("inner", "inner"), ("left_outer", "left"), ("full_outer", "full")]:
        l, r = _join_fixture()
        nat = _join_norm(native_join(l, r, jt, 4, on=("k",), right_on=("j",)))
        l, r = _join_fixture()
        cog = _join_norm(cogroup_join(l, r, ["k"], ["j"], how, num_parts=4))
        assert list(nat.columns) == list(cog.columns) == ["k", "x", "y"], jt
        assert nat.values.tolist() == cog.values.tolist(), jt


def test_native_join_falls_back_on_persistent_race(ray_session, monkeypatch):
    """If Ray's hash join keeps raising (the empty-partition race class),
    native_join must still return the correct rows via the cogroup plan."""
    import ray

    from apache___solr_ray.pipelines import common

    def boom(self, *a, **k):
        raise KeyError("j")  # the race's signature failure

    monkeypatch.setattr(ray.data.Dataset, "join", boom)
    l, r = _join_fixture()
    out = _join_norm(common.native_join(l, r, "full_outer", 4, on=("k",), right_on=("j",)))
    # keys 1..9, matched 4..6
    assert out["k"].tolist() == list(range(1, 10))
    assert out[out["k"] == 5]["y"].iloc[0] == 500
    assert (out[out["k"] <= 3]["y"] == -1).all()
    assert (out[out["k"] >= 7]["x"] == -1).all()
