"""Per-partition lineage manifests + atomic commit.

Rebuilds the role of the reference's transaction log + segments_N commit
point (``solr/core/src/java/org/apache/solr/update/UpdateLog.java``,
``DirectUpdateHandler2.commit`` at ``DirectUpdateHandler2.java:809-876``) in
batch-build form:

- every completed unit of work (doc partition tokenized, segment written)
  writes a small JSON manifest recording its input fingerprint, row counts
  and wall time — the lineage + metrics record the north_rule requires;
- a resumed build skips any unit whose manifest exists and whose input
  fingerprint still matches (no re-tokenizing completed partitions);
- the index becomes visible only when ``index_manifest.json`` is atomically
  renamed into place (the segments_N pointer-swap analog).

All writes are write-to-temp + ``os.replace`` so a killed build never leaves
a half-written manifest behind.
"""

from __future__ import annotations

import json
import os
from typing import Any


def write_json_atomic(path: str, obj: dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
    os.replace(tmp, path)


def read_json(path: str) -> dict[str, Any] | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def input_fingerprint(path: str, row_group_start: int, row_group_end: int, n_rows: int) -> str:
    """Deterministic fingerprint of one input slice.

    Uses basename + row-group range + row count + file size: a changed input
    partition invalidates only its own derived parts (SURVEY §7.4).
    """
    try:
        size = os.path.getsize(path)
    except OSError:
        size = -1
    return f"{os.path.basename(path)}:{row_group_start}-{row_group_end}:{n_rows}:{size}"


def is_valid(manifest_path: str, fingerprint: str) -> dict[str, Any] | None:
    """Return the manifest dict iff it exists and matches the fingerprint."""
    m = read_json(manifest_path)
    if m is not None and m.get("input_fingerprint") == fingerprint:
        return m
    return None


def index_fingerprint(index_dir: str) -> str:
    """Deterministic fingerprint of a committed index's logical content —
    the PeerSync / IndexFingerprint analog (reference
    solr/core/src/java/org/apache/solr/update/IndexFingerprint.java:
    replicas compare a cheap digest before deciding to sync). Computed
    from committed METADATA only (segment identities + posting counts +
    lineage/checksums + live tombstones), never by re-reading postings —
    O(#segments) at any corpus size. Two indexes built from the same
    inputs with the same config fingerprint identically; any append,
    delete, purge or config change diverges."""
    import hashlib
    import os

    man = read_json(os.path.join(index_dir, "index_manifest.json"))
    if man is None:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    h = hashlib.sha1()
    h.update(str(man.get("config", "")).encode())
    for s in sorted(man.get("segments", []), key=lambda x: x.get("skey", 0)):
        h.update(
            f"{s.get('name')}:{s.get('n_terms')}:{s.get('n_postings')}:"
            f"{s.get('bytes')}:{s.get('lineage', s.get('checksum', ''))};".encode()
        )
    stats = man.get("stats", {})
    h.update(f"{stats.get('doc_count')}:{stats.get('sum_total_tf')};".encode())
    from apache___solr_ray.deletes import load_tombstones

    tombs = load_tombstones(index_dir)
    h.update(",".join(str(int(t)) for t in sorted(tombs)).encode())
    return h.hexdigest()
