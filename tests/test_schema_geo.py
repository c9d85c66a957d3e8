"""Managed schema / schemaless guessing + WKT polygon filtering."""

import numpy as np
import pyarrow as pa
import pytest

from apache___solr_ray.geo import (
    WktError,
    convex_halfplane_mask,
    parse_wkt_polygon,
    points_in_polygon,
)
from apache___solr_ray.schema import (
    ManagedSchema,
    apply_schema,
    infer_column_type,
    observe_types,
    resolve_schema,
    widen,
)


def test_infer_column_type_lattice():
    assert infer_column_type(pa.array(["1", "-2", " 3 "])) == "int"
    assert infer_column_type(pa.array(["1", "2.5"])) == "float"
    assert infer_column_type(pa.array(["1e3", ".5"])) == "float"
    assert infer_column_type(pa.array(["true", "False"])) == "bool"
    assert infer_column_type(pa.array(["2024-01-02", "2024-01-02T03:04:05"])) == "date"
    assert infer_column_type(pa.array(["1", "x"])) == "string"
    assert infer_column_type(pa.array([None, None], pa.string())) is None


def test_widen_rules():
    assert widen("int", "float") == "float"
    assert widen("int", "int") == "int"
    assert widen("bool", "int") == "string"
    assert widen("date", "float") == "string"


def test_managed_schema_persist_and_evolve(tmp_path):
    p = str(tmp_path / "managed-schema.json")
    s = ManagedSchema.load(p)
    assert s.merge({"a": "int", "b": "string"}) is True
    s.save(p)
    s2 = ManagedSchema.load(p)
    assert s2.fields == {"a": "int", "b": "string"} and s2.version == 1
    # new field + widening conflict on re-ingest
    assert s2.merge({"a": "float", "c": "date"}) is True
    assert s2.fields["a"] == "float" and s2.fields["c"] == "date"
    assert s2.version == 2
    # idempotent merge does not bump
    assert s2.merge({"a": "float"}) is False
    assert s2.version == 2


def test_schemaless_roundtrip_distributed(ray_session, tmp_path):
    """Stringified typed data -> inference -> apply == original values
    (the ParseInt/Double/Boolean/Date URP chain end-to-end)."""
    import ray.data as rd

    n = 1000
    rng = np.random.Generator(np.random.PCG64(5))
    ints = rng.integers(-500, 500, n)
    floats = np.round(rng.normal(size=n), 6)
    bools = rng.integers(0, 2, n).astype(bool)
    tbl = pa.table(
        {
            "i": pa.array([str(v) for v in ints]),
            "f": pa.array([repr(float(v)) for v in floats]),
            "b": pa.array(["true" if v else "False" for v in bools]),
            "d": pa.array(["2024-05-%02dT01:02:%02d" % (1 + v % 28, v % 60) for v in range(n)]),
            "s": pa.array([f"txt{v}" for v in range(n)]),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    schema = resolve_schema(ds, str(tmp_path / "schema.json"))
    assert schema.fields == {"i": "int", "f": "float", "b": "bool", "d": "date", "s": "string"}
    out = apply_schema(ds, schema).to_pandas().sort_values("i", key=lambda s: s.astype(np.int64))
    assert out["i"].to_numpy(dtype=np.int64).sum() == ints.sum()
    assert np.isclose(sorted(out["f"])[0], floats.min())
    assert out["b"].dtype == bool and out["b"].sum() == bools.sum()
    assert str(out["d"].dtype).startswith("datetime64")


def test_observe_types_mixed_batches(ray_session):
    """A column int-like in one batch and float-like in another widens."""
    import ray.data as rd

    t1 = pa.table({"v": pa.array(["1", "2"])})
    t2 = pa.table({"v": pa.array(["3.5", "4"])})
    ds = rd.from_arrow([t1, t2])
    assert observe_types(ds)["v"] == "float"


# -- WKT / polygon -------------------------------------------------------------


def test_parse_wkt():
    poly = parse_wkt_polygon("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert poly.shape == (4, 2)
    with pytest.raises(WktError):
        parse_wkt_polygon("LINESTRING (0 0, 1 1)")
    with pytest.raises(WktError):
        parse_wkt_polygon("POLYGON ((0 0, 1 1))")


def test_ray_casting_square_and_concave():
    sq = parse_wkt_polygon("POLYGON ((0 0, 10 0, 10 10, 0 10))")
    x = np.array([5.0, -1.0, 10.5, 9.99, 0.01])
    y = np.array([5.0, 5.0, 5.0, 9.99, 0.01])
    assert points_in_polygon(x, y, sq).tolist() == [True, False, False, True, True]
    # concave "C" shape: the notch is outside
    c = parse_wkt_polygon("POLYGON ((0 0, 10 0, 10 3, 3 3, 3 7, 10 7, 10 10, 0 10))")
    xs = np.array([5.0, 5.0, 1.0])
    ys = np.array([5.0, 1.0, 5.0])
    assert points_in_polygon(xs, ys, c).tolist() == [False, True, True]


def test_ray_casting_equals_halfplane_on_convex():
    """On a generic convex polygon, even-odd ray casting must equal the
    half-plane AND (the SQL-expressible oracle form) for random points."""
    poly = parse_wkt_polygon(
        "POLYGON ((0 0, 8 -2, 12 4, 7 9, -1 6))"  # CCW convex pentagon
    )
    rng = np.random.Generator(np.random.PCG64(11))
    x = rng.uniform(-4, 15, 20000)
    y = rng.uniform(-5, 12, 20000)
    a = points_in_polygon(x, y, poly)
    b = convex_halfplane_mask(x, y, poly)
    assert np.array_equal(a, b)
