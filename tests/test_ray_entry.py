"""Replicates the driver's correctness gate locally: every queries() entry
runs at sf0.001, and every oracle_sql() entry must match DuckDB exactly
(row count + schema names + order-insensitive value equality)."""

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if df.empty and not len(df.columns):
            # Ray drops the columns of a fully-empty Dataset even when the
            # schema is known — rebuild them so empty==empty compares hold
            sch = res.schema()
            if sch is not None:
                df = pd.DataFrame({n: pd.Series(dtype="object") for n in sch.names})
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(float)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    # nested list/array cells (e.g. plot() data pairs) are unsortable keys
    sortable = [
        c
        for c in df.columns
        if not (
            df[c].dtype == object
            and len(df)
            and isinstance(df[c].iloc[0], (list, dict, np.ndarray))
        )
    ]
    if not sortable:
        return df.reset_index(drop=True)
    return df.sort_values(sortable).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def catalog(ray_session):
    return entrymod.queries(), entrymod.oracle_sql()


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert {"qid", "rank", "doc_id", "score"} <= set(df.columns)


def test_oracle_keys_subset(catalog):
    qs, oracles = catalog
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
    assert len(oracles) >= 18


@pytest.mark.parametrize(
    "name",
    sorted(set(__import__("apache___solr_ray.pipelines", fromlist=["all_queries"]).all_queries())),
)
def test_query_matches_oracle(name, catalog, con, ray_session):
    qs, oracles = catalog
    got = _canon(_to_pandas(qs[name](SF_DIR)))
    if name not in oracles:
        # rows-only entries: must run and return a well-formed frame
        assert got.shape[1] >= 1
        return
    want = _canon(con.sql(oracles[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa, bb = a.astype(float), b.astype(float)
            ok = ((aa - bb).abs() < 1e-9) | (aa.isna() & bb.isna())
            assert ok.all(), f"{name}.{c}: float values differ\n{aa[~ok].head()}\n{bb[~ok].head()}"
        else:
            assert a.tolist() == b.tolist(), f"{name}.{c}: values differ"
