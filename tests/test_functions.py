"""Sketch/function accuracy tests (HLL — the HLLAgg analog)."""

import numpy as np
import pyarrow as pa

from apache___solr_ray.functions.hll import _M, hll_add, hll_estimate


def test_hll_accuracy_and_mergeability():
    rng = np.random.Generator(np.random.PCG64(7))
    vals = rng.integers(0, 1 << 62, 50_000, dtype=np.int64)
    exact = len(np.unique(vals))

    # single sketch
    regs = np.zeros(_M, dtype=np.uint8)
    hll_add(regs, vals)
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.05  # p=12 → ~1.6% typical error

    # merge of partials must equal the single sketch (register-wise max)
    r1 = np.zeros(_M, dtype=np.uint8)
    r2 = np.zeros(_M, dtype=np.uint8)
    hll_add(r1, vals[:25_000])
    hll_add(r2, vals[25_000:])
    merged = np.maximum(r1, r2)
    assert (merged == regs).all()


def test_hll_small_range_linear_counting():
    regs = np.zeros(_M, dtype=np.uint8)
    vals = np.arange(100, dtype=np.int64)
    hll_add(regs, vals)
    assert abs(hll_estimate(regs) - 100) < 5


def test_tdigest_accuracy_and_merge():
    from apache___solr_ray.functions.tdigest import TDigest

    rng = np.random.Generator(np.random.PCG64(3))
    vals = rng.lognormal(0, 1.0, 100_000)
    td = TDigest().add(vals)
    assert len(td.means) < 1200  # bounded size (~2-6x compression)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        est = td.quantile(q)
        # rank error: where does est land in the exact CDF?
        rank = (vals <= est).mean()
        assert abs(rank - q) < 0.01, (q, est, exact, rank)

    # mergeability: sketch of halves ~= sketch of whole (rank error bound)
    t1 = TDigest().add(vals[:50_000])
    t2 = TDigest().add(vals[50_000:])
    merged = t1.merge(t2)
    for q in (0.05, 0.5, 0.95):
        rank = (vals <= merged.quantile(q)).mean()
        assert abs(rank - q) < 0.015, q

    # serialization roundtrip
    again = TDigest.from_bytes(merged.to_bytes())
    assert again.quantile(0.5) == merged.quantile(0.5)


def test_tdigest_query_close_to_exact(ray_session):
    """The distributed sketch query's p50/p95 land within tight rank error
    of the exact per-type quantiles."""
    import duckdb

    from apache___solr_ray.pipelines.relational import QUERIES

    sf = "/root/testdata/sf0.01"
    got = QUERIES["percentile_tdigest_sketch"](sf).to_pandas().set_index("event_type")
    exact = duckdb.sql(
        f"""SELECT event_type, quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.95) AS p95
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1"""
    ).df().set_index("event_type")
    vals = duckdb.sql(
        f"SELECT event_type, value FROM read_parquet('{sf}/events.parquet')"
    ).df()
    for et in exact.index:
        v = vals[vals.event_type == et]["value"].to_numpy()
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            rank = (v <= got.loc[et, col]).mean()
            assert abs(rank - q) < 0.02, (et, col, rank)


def test_aggfnv2_sketches_match_manual_merge(ray_session):
    """The AggregateFnV2 in-shuffle path must equal a manual single-process
    fold of the same data (partitioning cannot change the estimate)."""
    import ray

    from apache___solr_ray.functions.aggs import HLLSketch, TDigestSketch
    from apache___solr_ray.functions.hll import _M, hll_add, hll_estimate
    from apache___solr_ray.functions.tdigest import TDigest

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 5000, size=20_000)
    floats = rng.normal(50, 10, size=20_000)
    keys = rng.integers(0, 3, size=20_000)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "v": vals, "f": floats})
    ).repartition(7)

    got = {
        r["k"]: r["n"]
        for r in ds.groupby("k").aggregate(HLLSketch(on="v", alias_name="n")).take_all()
    }
    for k in np.unique(keys):
        regs = np.zeros(_M, dtype=np.uint8)
        hll_add(regs, vals[keys == k])
        assert got[int(k)] == int(round(hll_estimate(regs)))
        exact = len(np.unique(vals[keys == k]))
        assert abs(got[int(k)] - exact) / exact < 0.05

    gq = {
        r["k"]: TDigest.from_bytes(r["sk"]).quantile(0.9)
        for r in ds.groupby("k")
        .aggregate(TDigestSketch(on="f", alias_name="sk"))
        .take_all()
    }
    for k in np.unique(keys):
        v = floats[keys == k]
        rank = (v <= gq[int(k)]).mean()
        assert abs(rank - 0.9) < 0.02
