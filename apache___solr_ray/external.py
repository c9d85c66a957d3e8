"""ExternalFileField / FileFloatSource (reference:
solr/core/src/java/org/apache/solr/schema/ExternalFileField.java —
per-document float values kept OUTSIDE the index in a plain
``key=value`` text file (external_<field> in the data dir), reloadable
without reindexing, usable only through function queries;
FileFloatSource.java parses the file: one ``key=value`` per line,
LAST value wins for duplicate keys, unparseable lines are skipped,
missing keys take the field's default).

Ray mapping: the file is small-side state (one float per doc it
mentions, usually a ranking signal like page-rank or CTR). It is parsed
once on the driver, ``ray.put`` once, and query actors resolve
candidates' keys against the broadcast map — never per-batch re-reads,
never a shuffle. At 10^12 docs the same signal would ship as a Parquet
sidecar keyed by url with the identical last-wins merge applied at
load."""

from __future__ import annotations

__all__ = ["load_external_floats", "write_external_floats"]


def load_external_floats(path: str, default: float = 0.0) -> dict[str, float]:
    """Parse a ``key=value`` external-float file with the reference's
    semantics: last value wins, malformed lines are skipped silently
    (FileFloatSource logs and continues), values parse as float."""
    out: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            key, sep, val = line.rpartition("=")
            if not sep or not key:
                continue
            try:
                out[key] = float(val)
            except ValueError:
                continue
    return out


def write_external_floats(path: str, items) -> None:
    """Write the reference file format (one ``key=value`` per line)."""
    import os

    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        for k, v in items:
            f.write(f"{k}={v}\n")
    os.replace(tmp, path)
