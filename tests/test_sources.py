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
