"""Deletes — the DeleteStream / deleteById analog (reference
``solr/solrj-streaming/.../stream/DeleteStream.java`` javadoc: sink deleting
docs by uniqueKey; Lucene semantics: a delete is a TOMBSTONE — the doc stops
matching immediately, but collection statistics (docCount,
sumTotalTermFreq, df) are unchanged until a merge reclaims the postings,
exactly like Lucene liveDocs + merge).

Tombstones live in ``tombstones.json`` (sorted doc ids, written atomically);
readers load them at open and mask candidates during evaluation. Block-max
pruning stays sound: tombstoned docs are masked BEFORE threshold
accumulation, and region bounds only ever over-estimate.
``merge.merge_segments(purge_deletes=True)`` physically drops tombstoned
postings, recomputes live stats and clears the tombstone file.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from apache___solr_ray.manifest import read_json, write_json_atomic

TOMBSTONE_FILE = "tombstones.json"
PURGED_FILE = "purged.json"


def load_tombstones(index_dir: str) -> np.ndarray:
    d = read_json(os.path.join(index_dir, TOMBSTONE_FILE))
    if not d or not d.get("doc_ids"):
        return np.zeros(0, dtype=np.int64)
    return np.array(sorted(set(d["doc_ids"])), dtype=np.int64)


def delete_by_url(index_dir: str, urls: list[str]) -> int:
    """Tombstone the docs with these urls (uniqueKey deletes). Returns the
    number of newly tombstoned docs. Unknown urls are ignored (Solr's
    deleteById of a missing id is a no-op)."""
    want = pa.array(sorted(set(urls)), pa.string())
    found: list[int] = []
    docs_dir = os.path.join(index_dir, "docs")
    for f in sorted(os.listdir(docs_dir)):
        t = pq.read_table(os.path.join(docs_dir, f), columns=["url", "doc_id"])
        hit = t.filter(pc.is_in(t.column("url"), value_set=want))
        found.extend(int(x) for x in hit.column("doc_id").to_pylist())
    existing = load_tombstones(index_dir)
    merged = sorted(set(existing.tolist()) | set(found))
    write_json_atomic(
        os.path.join(index_dir, TOMBSTONE_FILE), {"doc_ids": merged}
    )
    return len(merged) - len(existing)


def clear_tombstones(index_dir: str) -> None:
    write_json_atomic(os.path.join(index_dir, TOMBSTONE_FILE), {"doc_ids": []})


def record_purged(index_dir: str, doc_ids, input_fingerprints: list[str]) -> None:
    """Durable purge ledger: remember which doc ids a purge-merge physically
    reclaimed, tagged with the *input fingerprint* of the doc partition each
    id belongs to. A later ``build_index`` (append / upsert) rebuilds
    segments from ``postings_raw`` — which still contains the purged docs —
    so the ledger lets it re-apply the deletes as tombstones instead of
    silently resurrecting them. An entry whose partition fingerprint no
    longer matches refers to rebuilt (different) content and is dropped."""
    existing = read_json(os.path.join(index_dir, PURGED_FILE)) or {"entries": {}}
    entries: dict[str, str] = dict(existing.get("entries", {}))
    for d in doc_ids:
        part = int(d) >> 32
        fp = input_fingerprints[part] if part < len(input_fingerprints) else ""
        entries[str(int(d))] = fp
    write_json_atomic(os.path.join(index_dir, PURGED_FILE), {"entries": entries})


def reapply_purged(index_dir: str, current_fingerprints: list[str]) -> int:
    """Re-assert purged deletes after a rebuild: every ledger entry whose
    partition input-fingerprint still matches the current build is merged
    back into ``tombstones.json`` (the doc exists again in the rebuilt
    segments and must stay dead). Stale entries (partition content changed,
    so the purged doc no longer exists) are pruned. Returns the number of
    re-applied tombstones."""
    ledger = read_json(os.path.join(index_dir, PURGED_FILE))
    if not ledger or not ledger.get("entries"):
        return 0
    keep: dict[str, str] = {}
    reapply: list[int] = []
    for doc_s, fp in ledger["entries"].items():
        part = int(doc_s) >> 32
        if part < len(current_fingerprints) and current_fingerprints[part] == fp:
            keep[doc_s] = fp
            reapply.append(int(doc_s))
    if reapply:
        existing = load_tombstones(index_dir)
        merged = sorted(set(existing.tolist()) | set(reapply))
        write_json_atomic(os.path.join(index_dir, TOMBSTONE_FILE), {"doc_ids": merged})
    write_json_atomic(os.path.join(index_dir, PURGED_FILE), {"entries": keep})
    return len(reapply)


def tombstoned_doc_lens(index_dir: str, tombs: np.ndarray) -> tuple[int, int]:
    """(n_docs, sum_doc_len) of the tombstoned set — what a purge subtracts
    from the live collection stats."""
    if len(tombs) == 0:
        return 0, 0
    parts = tombs >> np.int64(32)
    rows = tombs & np.int64(0xFFFFFFFF)
    total = 0
    for part in np.unique(parts):
        t = pq.read_table(
            os.path.join(index_dir, "docs", f"part-{int(part):06d}.parquet"),
            columns=["doc_len"],
        )
        total += int(
            pc.sum(t.column("doc_len").take(pa.array(rows[parts == part]))).as_py()
        )
    return len(tombs), total
