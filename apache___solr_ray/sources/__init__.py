"""Sources: readers for the engine's tables.

The reference dispatches ``/update`` payloads to per-format loaders
(``solr/core/src/java/org/apache/solr/handler/UpdateRequestHandler.java:
132-150`` → JsonLoader/CSVLoaderBase/XMLLoader...). Ray Data's native
readers play that role; these helpers add column pruning and the repo's
table conventions.
"""

from __future__ import annotations

import os


def load(sf_dir: str, table: str, columns: list[str] | None = None):
    """Read one test table as a Dataset, pruning columns at the read
    (row groups that don't contain the columns never leave storage)."""
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def load_arrow(sf_dir: str, table: str, columns: list[str] | None = None):
    """Small driver-side read (dimension tables, broadcast sides)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def read_csv(paths, **kw):
    import ray.data as rd

    return rd.read_csv(paths, **kw)


def read_json(paths, **kw):
    import ray.data as rd

    return rd.read_json(paths, **kw)


def read_text(paths, **kw):
    import ray.data as rd

    return rd.read_text(paths, **kw)
