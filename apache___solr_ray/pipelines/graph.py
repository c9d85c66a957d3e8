"""Graph traversal pipelines — the solrj-streaming graph expressions
(reference ``solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/
graph/GatherNodesStream.java`` and ``ShortestPathStream.java``) re-expressed
as Ray Data stages.

GatherNodesStream walks hop-by-hop: collect the frontier's distinct join
keys, then one filtered scan per hop (Solr issues exactly this shape as
re-queries). ShortestPathStream is a bounded BFS: the frontier (bounded by
the seed's reach at maxDepth, as in the reference, which holds the visited
set in coordinator memory) is broadcast per round and the edge Dataset is
scanned with a vectorized membership filter — edges never leave the
streamed Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from apache___solr_ray.sources import load

QUERIES: dict = {}
ORACLE: dict = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


#: frontier sizes up to this are collected + broadcast (ray.put is_in
#: probe — Solr's own gatherNodes re-query shape); above it the hop stays
#: fully distributed as a hash semi-join, so a high-fanout frontier (e.g.
#: hop-2 over 10^12 edges reaching ~|parts| distinct keys) never lands on
#: the driver
FRONTIER_BROADCAST_MAX = 1_000_000


def _hop(edge_ds, key_col: str, out_col: str, frontier_ds):
    """One gatherNodes hop: frontier ⋈ edges -> distinct out keys, as a
    Dataset named ``node``. Adaptive physical plan by frontier size."""
    from apache___solr_ray.pipelines.common import semi_join_filter
    from apache___solr_ray.stages.dedup import _default_join_partitions

    # frontiers are tiny relative to the edge tables (the whole premise of
    # gatherNodes); pin the blocks so count() + the probe don't re-run the
    # producing pipeline
    frontier_ds = frontier_ds.materialize()
    n = frontier_ds.count()
    if n <= FRONTIER_BROADCAST_MAX:
        keys = [r["node"] for r in frontier_ds.take_all()]
        reached = semi_join_filter(edge_ds, key_col, keys)
    else:
        from apache___solr_ray.pipelines.common import native_join

        reached = native_join(
            edge_ds,
            frontier_ds,
            "inner",
            _default_join_partitions(),
            on=(key_col,),
            right_on=("node",),
        )
    # distinct next-frontier nodes: per-batch unique + the partial-combine
    # fast path (Ray's sort aggregate has a per-reduce fixed cost far above
    # the data cost at frontier scale)
    from ray.data.aggregate import Sum

    from apache___solr_ray.pipelines.common import combine_partials

    def uniq(t: pa.Table, _c=out_col) -> pa.Table:
        u = pc.unique(t.column(_c).combine_chunks())
        return pa.table(
            {
                "node": u.cast(pa.int64()),
                "one": pa.array(np.ones(len(u), dtype=np.int64)),
            }
        )

    return combine_partials(
        reached.select_columns([out_col]).map_batches(uniq, batch_format="pyarrow"),
        ["node"],
        [Sum("one", alias_name="one")],
        sum_cols=["one"],
    ).select_columns(["node"])


def gather_nodes_ds(sf_dir: str):
    """The traversal itself, every level a Dataset (driver sees only what
    it chooses to collect)."""
    seeds = load(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        lambda t: pa.table(
            {
                "node": t.column("c_custkey")
                .filter(pa.array(t.column("c_custkey").to_numpy() % 100 == 0))
                .cast(pa.int64())
            }
        ),
        batch_format="pyarrow",
    )
    orders = load(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    hop1 = _hop(orders, "o_custkey", "o_orderkey", seeds)
    items = load(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    hop2 = _hop(items, "l_orderkey", "l_partkey", hop1)
    return seeds, hop1, hop2


@q(
    "graph_gather_nodes",
    """
    WITH seeds AS (SELECT c_custkey FROM customer WHERE c_custkey % 100 = 0),
    hop1 AS (SELECT DISTINCT o_orderkey FROM orders
             JOIN seeds ON o_custkey = c_custkey),
    hop2 AS (SELECT DISTINCT l_partkey FROM lineitem
             JOIN hop1 ON l_orderkey = o_orderkey)
    SELECT CAST(0 AS BIGINT) AS level, c_custkey AS node FROM seeds
    UNION ALL SELECT 1, o_orderkey FROM hop1
    UNION ALL SELECT 2, l_partkey FROM hop2
    """,
)
def graph_gather_nodes(sf_dir: str):
    """GatherNodesStream (2 hops): seed customers -> their orders -> the
    parts on those orders. Each hop is frontier ⋈ edges -> distinct, with
    an ADAPTIVE frontier plan: small frontiers broadcast (ray.put +
    vectorized is_in — Solr's own gatherNodes re-query shape), large ones
    stay distributed as a hash semi-join (FRONTIER_BROADCAST_MAX); both
    plans are result-identical (tests/test_graph_plans.py forces the
    distributed plan)."""
    seeds_ds, hop1_ds, hop2_ds = gather_nodes_ds(sf_dir)
    seeds = sorted(r["node"] for r in seeds_ds.take_all())
    hop1 = sorted(r["node"] for r in hop1_ds.take_all())
    hop2 = sorted(r["node"] for r in hop2_ds.take_all())
    levels = [0] * len(seeds) + [1] * len(hop1) + [2] * len(hop2)
    nodes = list(seeds) + list(hop1) + list(hop2)
    return pa.table(
        {
            "level": pa.array(levels, pa.int64()),
            "node": pa.array(nodes, pa.int64()),
        }
    )


def _bfs_rounds_distributed(edges, visited_ds, frontier_ds, start_depth: int, max_depth: int):
    """Fully-distributed BFS rounds: frontier ⋈ edges via the adaptive
    ``_hop`` (broadcast ≤ FRONTIER_BROADCAST_MAX, else hash semi-join),
    then a groupby-min anti-join against the visited Dataset — neither the
    frontier nor the visited set ever lands on the driver. Returns the
    final (node, dist) Dataset. Per-round materialize = the iterative-
    algorithm checkpoint (same reasoning as connected_components_ds)."""
    from ray.data.aggregate import Min

    visited_ds = visited_ds.materialize()
    frontier_ds = frontier_ds.materialize()
    for depth in range(start_depth, max_depth):
        reached = _hop(edges, "src", "dst", frontier_ds)

        def tag(t: pa.Table, new: int) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node").cast(pa.int64()),
                    "is_new": pa.array(np.full(t.num_rows, new, dtype=np.int64)),
                }
            )

        tagged = reached.map_batches(
            lambda t: tag(t, 1), batch_format="pyarrow"
        ).union(visited_ds.map_batches(lambda t: tag(t, 0), batch_format="pyarrow"))
        from apache___solr_ray.pipelines.common import combine_partials

        def min_partial(t: pa.Table) -> pa.Table:
            g = t.group_by("node").aggregate([("is_new", "min")])
            return pa.table({"node": g.column("node"), "nw": g.column("is_new_min")})

        fresh = (
            combine_partials(
                tagged.map_batches(min_partial, batch_format="pyarrow"),
                ["node"],
                [Min("nw", alias_name="nw")],
                min_cols=["nw"],
            )
            .map_batches(
                lambda t: pa.table(
                    {"node": t.filter(pc.equal(t.column("nw"), 1)).column("node")}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if fresh.count() == 0:
            break
        fresh_d = fresh.map_batches(
            lambda t, _d=depth + 1: pa.table(
                {
                    "node": t.column("node"),
                    "dist": pa.array(np.full(t.num_rows, _d, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        visited_ds = visited_ds.union(fresh_d).materialize()
        frontier_ds = fresh
    return visited_ds


@q(
    "graph_shortest_path",
    """
    WITH RECURSIVE e AS (
      SELECT DISTINCT l_orderkey * 2 AS a, l_partkey * 2 + 1 AS b FROM lineitem
    ),
    sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    bfs(node, d) AS (
      SELECT CAST(2 AS BIGINT), 0
      UNION ALL
      SELECT s.b, bfs.d + 1 FROM sym s JOIN bfs ON s.a = bfs.node
      WHERE bfs.d < 3
    )
    SELECT node, CAST(min(d) AS BIGINT) AS dist FROM bfs GROUP BY node
    """,
)
def graph_shortest_path(sf_dir: str, plan: str = "auto"):
    """ShortestPathStream (bounded BFS, maxDepth=3) over the bipartite
    order↔part graph (node encoding: order=2k, part=2k+1), from seed
    order 1. ADAPTIVE frontier (reuses FRONTIER_BROADCAST_MAX): while the
    reach stays small the frontier is broadcast (ray.put) and the edge
    Dataset is scanned with a vectorized is_in filter — the reference's
    own memory model (ShortestPathStream.java visited map on the
    coordinator). The moment a round's frontier exceeds the threshold the
    remaining rounds run FULLY DISTRIBUTED (``_bfs_rounds_distributed``):
    frontier and visited stay Datasets, the anti-join is a groupby-min —
    high-reach seeds never overflow the driver. ``plan`` in
    {auto, driver, distributed}; results identical (test_graph_plans.py
    forces the distributed plan). Oracle: DuckDB recursive CTE."""
    import ray

    max_depth = 3
    seed = 2  # order 1

    # The FRONTIER is broadcast each round (ray.put) and the edge Dataset
    # is scanned with a vectorized is_in + gather — the reference's
    # ShortestPathStream holds the visited set in coordinator memory
    # identically (bounded by the reach of the seed at maxDepth, not by
    # the graph); the edges themselves stay a streamed Dataset.
    edges = (
        load(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
        .map_batches(
            lambda t: pa.table(
                {
                    "src": pa.array(
                        np.concatenate(
                            [
                                t.column("l_orderkey").to_numpy() * 2,
                                t.column("l_partkey").to_numpy() * 2 + 1,
                            ]
                        ),
                        pa.int64(),
                    ),
                    "dst": pa.array(
                        np.concatenate(
                            [
                                t.column("l_partkey").to_numpy() * 2 + 1,
                                t.column("l_orderkey").to_numpy() * 2,
                            ]
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    import ray.data as rd

    def _visited_frontier_ds(dist: dict[int, int], frontier: np.ndarray):
        nodes = np.fromiter(dist.keys(), dtype=np.int64, count=len(dist))
        ds_v = rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes),
                    "dist": pa.array(
                        np.fromiter(dist.values(), dtype=np.int64, count=len(dist))
                    ),
                }
            )
        )
        ds_f = rd.from_arrow(pa.table({"node": pa.array(frontier, pa.int64())}))
        return ds_v, ds_f

    def _finish_distributed(dist, frontier, depth):
        v, f = _visited_frontier_ds(dist, frontier)
        out = _bfs_rounds_distributed(edges, v, f, depth, max_depth)
        return out.sort("node")

    if plan == "distributed":
        return _finish_distributed({seed: 0}, np.array([seed], dtype=np.int64), 0)

    dist: dict[int, int] = {seed: 0}
    frontier = np.array([seed], dtype=np.int64)
    for depth in range(max_depth):
        if plan == "auto" and len(frontier) > FRONTIER_BROADCAST_MAX:
            # high-reach seed: hand the remaining rounds to the fully
            # distributed plan before the frontier/visited overflow the
            # driver (dist is still <= reach at THIS depth, bounded by the
            # threshold that triggered the spill)
            return _finish_distributed(dist, frontier, depth)
        ref = ray.put(np.sort(frontier))

        def reach(t: pa.Table, _ref=ref) -> pa.Table:
            f = ray.get(_ref)
            src = t.column("src").to_numpy()
            keep = np.isin(src, f)
            return pa.table({"node": pa.array(t.column("dst").to_numpy()[keep], pa.int64())})

        nxt = set()
        for b in edges.map_batches(reach, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            nxt.update(b.column("node").to_pylist())
        fresh = [n for n in nxt if n not in dist]
        for n in fresh:
            dist[n] = depth + 1
        frontier = np.array(fresh, dtype=np.int64)
        if len(frontier) == 0:
            break

    out = pd.DataFrame(
        {"node": sorted(dist), "dist": [dist[n] for n in sorted(dist)]}
    )
    return pa.table(
        {
            "node": pa.array(out["node"].to_numpy(), pa.int64()),
            "dist": pa.array(out["dist"].to_numpy(), pa.int64()),
        }
    )
