"""Managed-schema / schemaless-ingest catalog entries.

Reference: ``ManagedIndexSchema.java`` + the schemaless chain
(``AddSchemaFieldsUpdateProcessorFactory.java`` with the ParseInt/
ParseDouble/ParseBoolean/ParseDate URPs): unknown incoming fields get a
type guessed from their VALUES, the schema is persisted/versioned, and
later batches widen it. Engine side: ``apache___solr_ray.schema``.

The oracle states the contract exactly: stringifying a typed table,
guessing, and parsing back must reproduce the original values — so the
oracle is simply the original typed columns.
"""

from __future__ import annotations

import os

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


@q(
    "schemaless_ingest_events",
    """
    SELECT event_id, user_id, value, event_type FROM events
    """,
)
def schemaless_ingest_events(sf_dir: str):
    """Schemaless round-trip over the events table: every column is
    stringified (the schemaless front door receives text), the managed
    schema is inferred distributed (per-batch type partials -> widening
    merge -> persisted versioned JSON), and ``apply_schema`` parses the
    values back. A single mis-guessed type or lossy parse fails the value
    hash against the original typed columns."""
    from apache___solr_ray.schema import apply_schema, resolve_schema

    ds = load(sf_dir, "events", columns=["event_id", "user_id", "value", "event_type"])

    def stringify(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: pc.cast(t.column(c), pa.string()) for c in t.column_names}
        )

    sds = ds.map_batches(stringify, batch_format="pyarrow")
    tag = os.path.basename(os.path.normpath(sf_dir))
    schema_path = f"/tmp/apache___solr_ray_cache/managed_schema_{tag}.json"
    schema = resolve_schema(sds, schema_path)
    return apply_schema(sds, schema)


