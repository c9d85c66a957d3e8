"""Managed schema + schemaless field-type guessing.

Reference surface: ``ManagedIndexSchema.java`` (mutable, persisted,
versioned schema) + ``AddSchemaFieldsUpdateProcessorFactory.java`` and the
ParseInt/ParseDouble/ParseBoolean/ParseDate URP chain (schemaless mode:
unknown incoming fields get a type GUESSED from their values, the schema
is extended atomically, and later documents must fit — or widen — the
guessed type).

Ray-Data-first restatement:
- type inference is a per-batch ``map_batches`` partial (vectorized regex
  classification over the batch's values; ONE tiny (column, type) table
  per batch leaves the task — never the data);
- the driver merges partials through the widening lattice
  ``bool < int < float < date < string`` ({int,float} widen to float;
  any other mix widens to string — Solr's parse-chain fallthrough);
- the managed schema persists as versioned JSON (atomic tmp+rename, the
  ManagedIndexSchema ZK-persist analog); re-ingesting with NEW fields
  extends it additively and bumps the version, re-ingesting with
  conflicting values widens;
- ``apply_schema`` casts every typed column in one vectorized pass.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from apache___solr_ray.manifest import read_json, write_json_atomic

#: widening lattice, narrowest first
_ORDER = ["bool", "int", "float", "date", "string"]

_INT_RE = r"^[+-]?\d+$"
_FLOAT_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"
_DATE_RE = r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2}(\.\d+)?Z?)?$"
_BOOL_SET = ("true", "false", "True", "False")


class SchemaConflict(ValueError):
    pass


def widen(a: str, b: str) -> str:
    """Two observed types -> the narrowest schema type that fits both
    (the AddSchemaFields parse-chain fallthrough)."""
    if a == b:
        return a
    if {a, b} <= {"int", "float"}:
        return "float"
    return "string"


def infer_column_type(arr: pa.Array | pa.ChunkedArray) -> str | None:
    """Narrowest type every non-null value of a STRING column fits.
    Returns None for an all-null column (no evidence — Solr leaves the
    field unguessed until a value arrives)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = arr.drop_null()
    if len(valid) == 0:
        return None
    v = pc.utf8_trim_whitespace(valid)

    def _all(mask) -> bool:
        return bool(pc.all(mask).as_py())

    if _all(pc.is_in(v, value_set=pa.array(_BOOL_SET))):
        return "bool"
    if _all(pc.match_substring_regex(v, _INT_RE)):
        return "int"
    if _all(pc.match_substring_regex(v, _FLOAT_RE)):
        return "float"
    if _all(pc.match_substring_regex(v, _DATE_RE)):
        return "date"
    return "string"


class ManagedSchema:
    """Versioned field->type map persisted as JSON (tmp+rename atomic)."""

    def __init__(self, fields: dict[str, str] | None = None, version: int = 0):
        self.fields = dict(fields or {})
        self.version = int(version)

    @classmethod
    def load(cls, path: str) -> "ManagedSchema":
        d = read_json(path)
        if d is None:
            return cls()
        return cls(d.get("fields", {}), d.get("version", 0))

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        write_json_atomic(path, {"fields": self.fields, "version": self.version})

    def merge(self, observed: dict[str, str]) -> bool:
        """Extend/widen with newly observed field types; returns True (and
        bumps the version) iff anything changed."""
        changed = False
        for name, typ in sorted(observed.items()):
            cur = self.fields.get(name)
            new = typ if cur is None else widen(cur, typ)
            if new != cur:
                self.fields[name] = new
                changed = True
        if changed:
            self.version += 1
        return changed


def observe_types(ds) -> dict[str, str]:
    """Distributed inference pass: per-batch (column, type) partials —
    tiny tables, the data never leaves the tasks — merged through the
    widening lattice on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        cols, typs = [], []
        for name in t.column_names:
            col = t.column(name)
            if not pa.types.is_string(col.type):
                # already typed at the source: record the arrow type
                kind = (
                    "int" if pa.types.is_integer(col.type)
                    else "float" if pa.types.is_floating(col.type)
                    else "bool" if pa.types.is_boolean(col.type)
                    else "date" if pa.types.is_timestamp(col.type)
                    else "string"
                )
            else:
                kind = infer_column_type(col)
                if kind is None:
                    continue
            cols.append(name)
            typs.append(kind)
        return pa.table({"column": pa.array(cols, pa.string()), "type": pa.array(typs, pa.string())})

    out: dict[str, str] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        c, t = row["column"], row["type"]
        out[c] = t if c not in out else widen(out[c], t)
    return out


def resolve_schema(ds, schema_path: str) -> ManagedSchema:
    """One inference pass + persisted merge — the schemaless ingest's
    schema-mutation step (AddSchemaFieldsUpdateProcessor.processAdd)."""
    schema = ManagedSchema.load(schema_path)
    schema.merge(observe_types(ds))
    schema.save(schema_path)
    return schema


def apply_schema(ds, schema: ManagedSchema):
    """Cast every string column to its managed type in one vectorized
    map_batches (the ParseInt/ParseDouble/ParseBoolean/ParseDate chain)."""
    fields = dict(schema.fields)

    def cast(t: pa.Table, _f=fields) -> pa.Table:
        for i, name in enumerate(t.column_names):
            col = t.column(name)
            typ = _f.get(name)
            if typ is None or not pa.types.is_string(col.type) or typ == "string":
                continue
            v = pc.utf8_trim_whitespace(col.combine_chunks())
            if typ == "int":
                out = pc.cast(v, pa.int64())
            elif typ == "float":
                out = pc.cast(v, pa.float64())
            elif typ == "bool":
                out = pc.equal(pc.utf8_lower(v), "true")
            else:  # date: ISO date or datetime
                full = pc.match_substring_regex(v, r"[T ]\d{2}:\d{2}:\d{2}")
                as_dt = pc.strptime(
                    pc.replace_substring(v, " ", "T"),
                    format="%Y-%m-%dT%H:%M:%S",
                    unit="us",
                    error_is_null=True,
                )
                as_d = pc.strptime(v, format="%Y-%m-%d", unit="us", error_is_null=True)
                out = pc.if_else(full, as_dt, as_d)
            t = t.set_column(i, name, out)
        return t

    return ds.map_batches(cast, batch_format="pyarrow")
