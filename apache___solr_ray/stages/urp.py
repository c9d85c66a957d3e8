"""Update-request-processor equivalents: vectorized field mutators.

The reference runs every document through a chain of URPs before indexing
(``solr/core/src/java/org/apache/solr/update/processor/`` —
``UpdateRequestProcessorChain.java``; invoked from
``ContentStreamHandlerBase.java:83-85``). All the stateless ones fuse into
one projection stage here: each function is ``pa.Table -> pa.Table``,
pyarrow-compute vectorized, composable with ``chain(...)`` and applied via
``ds.map_batches(chain(...), batch_format="pyarrow")``.

Reference parity (same directory unless noted):
  trim_fields           <- TrimFieldUpdateProcessorFactory.java
  remove_blank          <- RemoveBlankFieldUpdateProcessorFactory.java
  truncate_field        <- TruncateFieldUpdateProcessorFactory.java
  concat_fields         <- ConcatFieldUpdateProcessorFactory.java
  field_length          <- FieldLengthUpdateProcessorFactory.java
  count_field_values    <- CountFieldValuesUpdateProcessorFactory.java
  regex_replace         <- RegexReplaceProcessorFactory.java
  parse_numeric         <- ParseIntFieldUpdateProcessorFactory.java (+Long/...)
  default_value         <- DefaultValueUpdateProcessorFactory.java
  uuid_field            <- UUIDUpdateProcessorFactory.java (deterministic
                           variant: UUIDv5-style from a key column)
  clone_field           <- CloneFieldUpdateProcessorFactory.java
  ignore_fields         <- IgnoreFieldUpdateProcessorFactory.java
  first/last/min/max_value <- FirstFieldValue/... (multi-valued reducers)
  uniq_values           <- UniqFieldsUpdateProcessorFactory.java
  html_strip            <- HTMLStripFieldUpdateProcessorFactory.java:64
"""

from __future__ import annotations

import hashlib
import uuid
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

Stage = Callable[[pa.Table], pa.Table]


def chain(*stages: Stage) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        for s in stages:
            t = s(t)
        return t

    return run


def _replace(t: pa.Table, name: str, arr) -> pa.Table:
    i = t.column_names.index(name)
    return t.set_column(i, name, arr)


def trim_fields(*names: str) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        for n in names:
            t = _replace(t, n, pc.utf8_trim_whitespace(t.column(n)))
        return t

    return run


def remove_blank(*names: str) -> Stage:
    """Blank strings -> null (RemoveBlankField semantics)."""

    def run(t: pa.Table) -> pa.Table:
        for n in names:
            col = t.column(n)
            blank = pc.equal(col, "")
            t = _replace(t, n, pc.if_else(blank, pa.scalar(None, pa.string()), col))
        return t

    return run


def truncate_field(name: str, max_len: int) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        return _replace(t, name, pc.utf8_slice_codeunits(t.column(name), 0, max_len))

    return run


def concat_fields(out: str, names: list[str], sep: str = ",") -> Stage:
    def run(t: pa.Table) -> pa.Table:
        arr = pc.binary_join_element_wise(*[t.column(n) for n in names], sep)
        return t.append_column(out, arr)

    return run


def field_length(out: str, name: str) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        return t.append_column(out, pc.cast(pc.utf8_length(t.column(name)), pa.int64()))

    return run


def count_field_values(out: str, name: str) -> Stage:
    """For list-typed columns: number of values per row."""

    def run(t: pa.Table) -> pa.Table:
        return t.append_column(out, pc.cast(pc.list_value_length(t.column(name)), pa.int64()))

    return run


def regex_replace(name: str, pattern: str, replacement: str) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        return _replace(
            t, name, pc.replace_substring_regex(t.column(name), pattern=pattern, replacement=replacement)
        )

    return run


def parse_numeric(name: str, type_: pa.DataType = None) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        return _replace(t, name, pc.cast(t.column(name), type_ or pa.float64()))

    return run


def default_value(name: str, value) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        col = t.column(name)
        return _replace(t, name, pc.fill_null(col, value))

    return run


def uuid_field(out: str, key_col: str) -> Stage:
    """Deterministic UUID (v5-style over the key) — the batch-build analog of
    UUIDUpdateProcessorFactory (a random UUID would break re-run identity)."""

    def run(t: pa.Table) -> pa.Table:
        vals = [
            str(uuid.UUID(hashlib.md5(f"solr-ray:{v}".encode()).hexdigest()))
            for v in t.column(key_col).to_pylist()
        ]
        return t.append_column(out, pa.array(vals, pa.string()))

    return run


def clone_field(src: str, dst: str) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        return t.append_column(dst, t.column(src))

    return run


def ignore_fields(*names: str) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        return t.drop_columns(list(names))

    return run


def min_value(out: str, name: str) -> Stage:
    """Per-row min of a list column (MinFieldValueUpdateProcessorFactory)."""

    def run(t: pa.Table) -> pa.Table:
        col = t.column(name).combine_chunks() if isinstance(t.column(name), pa.ChunkedArray) else t.column(name)
        mins = pa.array([min(v) if v else None for v in col.to_pylist()])
        return t.append_column(out, mins)

    return run


def max_value(out: str, name: str) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        col = t.column(name)
        vals = pa.array([max(v) if v else None for v in col.to_pylist()])
        return t.append_column(out, vals)

    return run


def first_value(out: str, name: str) -> Stage:
    def run(t: pa.Table) -> pa.Table:
        return t.append_column(out, pc.list_element(t.column(name), 0))

    return run


def last_value(out: str, name: str) -> Stage:
    """LastFieldValueUpdateProcessorFactory: keep the last list element."""

    def run(t: pa.Table) -> pa.Table:
        col = t.column(name)
        vals = [v[-1] if v else None for v in col.to_pylist()]
        return t.append_column(out, pa.array(vals, col.type.value_type))

    return run


def timestamp_field(out: str, ts) -> Stage:
    """TimestampUpdateProcessorFactory: stamp every doc with the request
    time. The reference stamps NOW per update request; a deterministic
    batch build passes the job's logical timestamp in (reproducible runs
    — same input + same job ts => byte-identical output)."""
    import datetime as _dt

    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)

    def run(t: pa.Table) -> pa.Table:
        return t.append_column(
            out, pa.array([ts] * t.num_rows, pa.timestamp("us"))
        )

    return run


def template_field(out: str, template: str) -> Stage:
    """TemplateUpdateProcessorFactory: render ``{field}`` placeholders from
    the row's own columns (vectorized: one binary_join per literal chunk)."""
    import re as _re

    parts = _re.split(r"\{(\w+)\}", template)  # [lit, field, lit, field, ...]

    def run(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = []
        for i, p in enumerate(parts):
            if i % 2 == 0:
                if p:
                    cols.append(pa.array([p] * n, pa.string()))
            else:
                cols.append(pc.fill_null(pc.cast(t.column(p), pa.string()), ""))
        if not cols:
            return t.append_column(out, pa.array([""] * n, pa.string()))
        joined = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(*cols, "")
        return t.append_column(out, joined)

    return run


def uniq_values(name: str) -> Stage:
    """Within-row dedup of a list column (UniqFieldsUpdateProcessorFactory)."""

    def run(t: pa.Table) -> pa.Table:
        col = t.column(name)
        out = []
        for v in col.to_pylist():
            if v is None:
                out.append(None)
            else:
                seen = dict.fromkeys(v)  # order-preserving
                out.append(list(seen))
        return _replace(t, name, pa.array(out))

    return run


def html_strip(name: str, out: str | None = None) -> Stage:
    from apache___solr_ray.extract import extract_batch

    def run(t: pa.Table) -> pa.Table:
        arr = extract_batch(t.column(name))
        if out is None or out == name:
            return _replace(t, name, arr)
        return t.append_column(out, arr)

    return run


def url_classify(name: str) -> Stage:
    """URLClassifyProcessor analog (reference
    solr/core/src/java/org/apache/solr/update/processor/
    URLClassifyProcessor.java: derive url_domain / url_length /
    url_levels / url_landingpage from a url field). Vectorized Arrow
    string kernels; levels counts path segments after the authority,
    landing page = empty path, '/', or /index.<ext>."""
    import pyarrow.compute as pc

    def run(t: pa.Table) -> pa.Table:
        u = t.column(name)
        domain = pc.extract_regex(u, r"^[a-z][a-z0-9+.-]*://(?P<d>[^/?#]+)")
        domain = pc.struct_field(domain, "d")
        # path: everything after the authority, before ? or #
        path = pc.extract_regex(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+(?P<p>/[^?#]*)?")
        path = pc.fill_null(pc.struct_field(path, "p"), "")
        # levels = path segments (count '/' not followed by end)
        seg = pc.count_substring(path, "/")
        trailing = pc.ends_with(path, "/")
        levels = pc.subtract(seg, pc.cast(trailing, pa.int64()))
        landing = pc.or_(
            pc.is_in(path, value_set=pa.array(["", "/"])),
            pc.match_like(path, "/index.%"),
        )
        return (
            t.append_column("url_domain", domain)
            .append_column("url_length", pc.utf8_length(u))
            .append_column("url_levels", pc.cast(levels, pa.int64()))
            .append_column("url_landingpage", pc.cast(landing, pa.int64()))
        )

    return run


def tolerant(stage: Stage, error_col: str = "_error") -> Stage:
    """TolerantUpdateProcessor analog (reference
    solr/core/src/java/org/apache/solr/update/processor/
    TolerantUpdateProcessor.java: collect per-document failures instead of
    failing the whole batch). The wrapped stage runs on the batch; if it
    raises, each row is retried alone — failing rows pass through
    UNCHANGED with the error message in ``error_col``, good rows get the
    stage's output. The batch path stays vectorized; the per-row fallback
    only runs for batches that actually contain a poison row."""

    def run(t: pa.Table) -> pa.Table:
        try:
            out = stage(t)
            return out.append_column(
                error_col, pa.array([None] * out.num_rows, pa.string())
            )
        except Exception:
            pass
        rows, errs = [], []
        out_schema = None
        for i in range(t.num_rows):
            one = t.slice(i, 1)
            try:
                good = stage(one)
                out_schema = good.schema
                rows.append(good)
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — the channel IS the point
                rows.append(None)
                errs.append(f"{type(e).__name__}: {e}")
        if out_schema is None:
            # every row failed: passthrough with errors
            return t.append_column(error_col, pa.array(errs, pa.string()))
        # error column aligned with ACTUAL output rows: a wrapped stage may
        # filter (0 rows out) or expand (>1 rows out) an input row — repeat
        # the per-input error value once per emitted row (failed rows always
        # pass through as exactly one row)
        fixed, err_out = [], []
        for i, r in enumerate(rows):
            if r is not None:
                fixed.append(r)
                err_out.extend([None] * r.num_rows)
            else:
                # passthrough row padded with nulls for stage-added columns
                one = t.slice(i, 1)
                cols = {}
                for f in out_schema:
                    if f.name in one.column_names:
                        cols[f.name] = one.column(f.name).cast(f.type)
                    else:
                        cols[f.name] = pa.array([None], f.type)
                fixed.append(pa.table(cols, schema=out_schema))
                err_out.append(errs[i])
        out = pa.concat_tables(fixed)
        return out.append_column(error_col, pa.array(err_out, pa.string()))

    return run


def ignore_large_documents(col: str, max_bytes: int) -> Stage:
    """IgnoreLargeDocumentProcessor analog (reference
    IgnoreLargeDocumentProcessorFactory.java: drop documents over a size
    limit instead of indexing them) — a vectorized byte-length filter."""

    def run(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.less_equal(pc.binary_length(pc.cast(t.column(col), pa.binary())), max_bytes)
        )

    return run


def script_processor(fn: Callable[[dict], dict | None]) -> Stage:
    """ScriptUpdateProcessor analog (reference
    solr/modules/scripting/src/java/org/apache/solr/scripting/update/
    ScriptUpdateProcessorFactory.java: a user script's ``processAdd(cmd)``
    runs per document and may mutate fields or return false to drop the
    doc). The script here is a plain Python callable ``doc_dict ->
    doc_dict | None`` (None drops the doc, mirroring ``return false``).
    Per-row by CONTRACT — this is the escape hatch for logic the
    vectorized URPs can't express, exactly the reference's positioning;
    keep hot-path transforms in the pyarrow stages."""

    def run(t: pa.Table) -> pa.Table:
        out = [r for r in (fn(row) for row in t.to_pylist()) if r is not None]
        if not out:
            return t.schema.empty_table()
        return pa.Table.from_pylist(out)

    return run


def collation_key(name: str, out: str, strength: str = "primary") -> Stage:
    """ICUCollationField analog (reference solr/modules/analysis-extras/
    src/java/org/apache/solr/schema/ICUCollationField.java: locale-aware
    binary sort keys; strength=primary ignores case and accents,
    secondary ignores case only). ICU itself isn't available, so the key
    is the documented locale-independent fold: NFKD-decompose and strip
    combining marks (accent fold), then casefold — which is precisely
    DuckDB's ``lower(strip_accents(x))`` for primary and
    ``strip_accents``-less casefold for secondary, so entries sorting by
    the key have an exact SQL mirror."""
    import unicodedata

    if strength not in ("primary", "secondary"):
        raise ValueError("strength must be 'primary' or 'secondary'")

    def key_one(s):
        if s is None:
            return None
        if strength == "primary":
            s = "".join(
                c for c in unicodedata.normalize("NFKD", s)
                if not unicodedata.combining(c)
            )
        return s.lower()

    def run(t: pa.Table) -> pa.Table:
        keys = pa.array([key_one(s) for s in t.column(name).to_pylist()], pa.string())
        if out in t.column_names:
            return _replace(t, out, keys)
        return t.append_column(out, keys)

    return run
