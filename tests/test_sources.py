"""Loader surface (CSVLoader/JsonLoader analogs): the CSV/NDJSON roundtrip
queries must aggregate to exactly what the parquet source says."""

import duckdb
import pandas as pd


def _expected(sf_dir):
    return (
        duckdb.sql(
            f"SELECT event_type, count(*) AS n FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1"
        )
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def test_csv_and_json_loader_roundtrips(ray_session):
    from apache___solr_ray.pipelines.text import QUERIES

    sf = "/root/testdata/sf0.001"
    want = _expected(sf)
    for name in ("csv_loader_roundtrip", "json_loader_roundtrip"):
        got = (
            QUERIES[name](sf)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert got["event_type"].tolist() == want["event_type"].tolist(), name
        assert got["n"].tolist() == want["n"].tolist(), name


def test_tolerant_urp_collects_row_errors():
    """TolerantUpdateProcessor semantics: a poison row doesn't fail the
    batch — it passes through with the error recorded, good rows process."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache___solr_ray.stages.urp import ignore_large_documents, tolerant

    def parse_int(t: pa.Table) -> pa.Table:
        return t.append_column("n", pc.cast(t.column("raw"), pa.int64()))

    t = pa.table({"id": [1, 2, 3], "raw": ["10", "oops", "30"]})
    out = tolerant(parse_int)(t)
    assert out.column("n").to_pylist() == [10, None, 30]
    errs = out.column("_error").to_pylist()
    assert errs[0] is None and errs[2] is None
    assert errs[1] and "ArrowInvalid" in errs[1]

    # clean batch: vectorized path, no per-row fallback, null errors
    t2 = pa.table({"id": [1, 2], "raw": ["7", "8"]})
    out2 = tolerant(parse_int)(t2)
    assert out2.column("n").to_pylist() == [7, 8]
    assert out2.column("_error").to_pylist() == [None, None]

    # IgnoreLargeDocument: size guard drops the oversized doc
    big = pa.table({"id": [1, 2], "text": ["ok", "x" * 100]})
    kept = ignore_large_documents("text", 10)(big)
    assert kept.column("id").to_pylist() == [1]


def test_xml_loader_roundtrip_equality(ray_session, tmp_path):
    """read_xml_adds(write_xml_add(T)) == T (strings), including
    multivalued collection, XML escaping, and the filtering-stage
    interaction with tolerant()."""
    import pyarrow as pa

    from apache___solr_ray.sources import read_xml_adds, write_xml_add

    t = pa.table(
        {
            "id": ["1", "2", "3"],
            "title": ["a < b & c", 'quo"te', "plain"],
            "tags": [["x", "y"], [], ["z"]],
        }
    )
    p = str(tmp_path / "add.xml")
    write_xml_add(t, p)
    back = read_xml_adds(p, multivalued={"tags"}).to_pandas().sort_values("id")
    assert back["id"].tolist() == ["1", "2", "3"]
    assert back["title"].tolist() == ["a < b & c", 'quo"te', "plain"]
    assert [list(x) for x in back["tags"]] == [["x", "y"], [], ["z"]]


def test_tolerant_wraps_filtering_stage():
    """tolerant() around a stage that can DROP rows keeps the error column
    aligned with the actual output rows (advisor finding)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache___solr_ray.stages.urp import tolerant

    def drop_evens_parse(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t.column("id"), 1), 1))
        return t.append_column("n", pc.cast(t.column("raw"), pa.int64()))

    # poison row forces the per-row fallback; row id=2 is filtered (0 rows)
    t = pa.table({"id": [1, 2, 3], "raw": ["10", "20", "oops"]})
    out = tolerant(drop_evens_parse)(t)
    assert out.column("id").to_pylist() == [1, 3]
    assert out.column("n").to_pylist() == [10, None]
    errs = out.column("_error").to_pylist()
    assert errs[0] is None and errs[1] and "ArrowInvalid" in errs[1]


def test_partitioned_sink_resume_and_crash_recovery(ray_session, tmp_path):
    """write_partitioned: first run writes every partition; an identical
    re-run skips all (zero-read fast path with expected_values); deleting
    one partition's manifest re-writes ONLY that partition; a fingerprint
    change rewrites everything."""
    import os

    import pyarrow.parquet as pq

    from apache___solr_ray.sinks import read_partitioned, write_partitioned
    from apache___solr_ray.sources import load

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "sink")
    ds = load(sf, "events", columns=["event_type", "event_id"])
    types = sorted(
        pq.read_table(f"{sf}/events.parquet", columns=["event_type"])
        .column("event_type")
        .unique()
        .to_pylist()
    )

    r1 = write_partitioned(ds, out, "event_type", "fp1", expected_values=types)
    assert sorted(r1["written"]) == types and not r1["skipped"]

    r2 = write_partitioned(ds, out, "event_type", "fp1", expected_values=types)
    assert not r2["written"] and sorted(r2["skipped"]) == types

    # crash recovery: one partition loses its manifest -> only it rewrites
    os.remove(os.path.join(out, f"event_type={types[0]}", "manifest.json"))
    r3 = write_partitioned(ds, out, "event_type", "fp1", expected_values=types)
    assert r3["written"] == [types[0]]
    assert sorted(r3["skipped"]) == types[1:]

    # input changed -> full rewrite
    r4 = write_partitioned(ds, out, "event_type", "fp2", expected_values=types)
    assert sorted(r4["written"]) == types

    # roundtrip: written bytes equal the source
    back = read_partitioned(out, "event_type").to_pandas()
    src = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "event_id"]).to_pandas()
    a = back.sort_values(["event_type", "event_id"]).reset_index(drop=True)
    b = src.sort_values(["event_type", "event_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_urp_last_timestamp_template():
    import pyarrow as pa

    from apache___solr_ray.stages.urp import last_value, template_field, timestamp_field

    t = pa.table(
        {
            "tags": pa.array([["a", "b", "c"], ["x"], None], pa.list_(pa.string())),
            "name": ["n1", None, "n3"],
            "k": [1, 2, 3],
        }
    )
    out = last_value("last_tag", "tags")(t)
    assert out.column("last_tag").to_pylist() == ["c", "x", None]

    out = timestamp_field("ingested_at", "2026-08-18T00:00:00")(t)
    vals = out.column("ingested_at").to_pylist()
    assert len(set(vals)) == 1 and vals[0].year == 2026

    out = template_field("title", "doc-{k}: {name}!")(t)
    assert out.column("title").to_pylist() == ["doc-1: n1!", "doc-2: !", "doc-3: n3!"]


def test_external_file_floats_reference_semantics(tmp_path):
    """FileFloatSource parsing contract: last value wins for duplicate
    keys, malformed lines and comments are skipped, values are floats."""
    from apache___solr_ray.external import load_external_floats, write_external_floats

    p = str(tmp_path / "external_f.txt")
    with open(p, "w") as f:
        f.write("a=1.5\n# comment\n\nb=2\nnotakv\nc=oops\na=9.25\n=3\nd=1e-3\n")
    got = load_external_floats(p)
    assert got == {"a": 9.25, "b": 2.0, "d": 0.001}

    # writer round-trips exactly (repr-exact floats)
    write_external_floats(p, [("x", 0.123456789012345), ("y", 3.0)])
    assert load_external_floats(p) == {"x": 0.123456789012345, "y": 3.0}
