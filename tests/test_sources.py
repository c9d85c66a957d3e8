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
