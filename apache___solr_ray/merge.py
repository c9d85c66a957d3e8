"""Tiered segment merging — the TieredMergePolicy analog.

The reference merges flushed segments tier-by-tier in background threads
([Lucene 10.4 library] TieredMergePolicy, wired at
``solr/core/src/java/org/apache/solr/index/DefaultMergePolicyFactory.java:42``,
``SolrIndexConfig.java:262-265``). Here the same role is played by a Ray
Data stage over term partitions: within each tkey, while a tkey holds more
than ``target_per_tkey`` segments, the ``merge_factor`` smallest-by-bytes
segments are k-way merged (term-sorted streams; each term's posting parts
concatenate in doc order because segments hold disjoint doc ranges) into a
new immutable segment. The index manifest is atomically re-committed and
only then are the source segment directories deleted — a crash between
commit and delete leaves harmless garbage, never a broken index.

Query results are bit-identical before and after merging (asserted by
tests): merging changes layout, not content.
"""

from __future__ import annotations

import heapq
import os
import shutil

import numpy as np
import pyarrow as pa

from apache___solr_ray.manifest import read_json, write_json_atomic
from apache___solr_ray.segment import SegmentReader, write_segment


def _merge_group(index_dir: str, tkey: int, sources: list[dict], out_name: str, tombs=None) -> dict:
    """K-way merge source segments (sorted term dicts) into one segment."""
    readers = [SegmentReader(os.path.join(index_dir, "segments", s["name"])) for s in sources]
    iters = []
    for si, r in enumerate(readers):
        it = r.iter_terms()
        iters.append((si, it))
    heap: list[tuple[str, int, int, int]] = []
    for si, it in iters:
        try:
            term, df, ttf = next(it)
            heap.append((term, si, df, ttf))
        except StopIteration:
            pass
    heapq.heapify(heap)
    terms, payloads, dfs, ttfs, max_tfs = [], [], [], [], []
    while heap:
        term = heap[0][0]
        group: list[tuple[int, int, int]] = []
        while heap and heap[0][0] == term:
            _, si, df, ttf = heapq.heappop(heap)
            group.append((si, df, ttf))
            try:
                nterm, ndf, nttf = next(iters[si][1])
                heapq.heappush(heap, (nterm, si, ndf, nttf))
            except StopIteration:
                pass
        parts = []
        for si, _, _ in group:
            v = readers[si].postings(term)
            dec = v.decode_all()
            if v.has_positions:
                pdata, poff = v.positions_raw(tfs=dec[1])
                parts.append((dec, pdata, np.diff(poff)))
            else:
                parts.append((dec, None, None))
        # segments hold disjoint doc ranges -> sort parts by first doc, concat
        parts.sort(key=lambda p: int(p[0][0][0]) if len(p[0][0]) else 0)
        docs = np.concatenate([p[0][0] for p in parts])
        tfs = np.concatenate([p[0][1] for p in parts])
        norms = np.concatenate([p[0][2] for p in parts])
        # positions merge = raw byte concat (per-posting streams are
        # self-contained); present iff every part carries them
        pos_data = pos_lens = None
        if all(p[1] is not None for p in parts):
            pos_data = np.concatenate([p[1] for p in parts])
            pos_lens = np.concatenate([p[2] for p in parts])
        if tombs is not None and len(tombs):
            # purge: drop tombstoned postings (Lucene merge reclaiming
            # deletes); a term whose postings vanish leaves the dict
            alive = ~np.isin(docs, tombs)
            docs, tfs, norms = docs[alive], tfs[alive], norms[alive]
            if len(docs) == 0:
                continue
            if pos_data is not None:
                off = np.zeros(len(pos_lens) + 1, dtype=np.int64)
                np.cumsum(pos_lens, out=off[1:])
                keep_lens = pos_lens[alive]
                starts_keep = off[:-1][alive]
                # gather the surviving postings' byte slices
                rel = np.arange(int(keep_lens.sum()), dtype=np.int64)
                run0 = np.zeros(len(keep_lens), dtype=np.int64)
                np.cumsum(keep_lens[:-1], out=run0[1:])
                rel -= np.repeat(run0, keep_lens)
                pos_data = pos_data[np.repeat(starts_keep, keep_lens) + rel]
                pos_lens = keep_lens
        from apache___solr_ray import codec

        pos_off = None
        if pos_data is not None:
            pos_off = np.zeros(len(pos_lens) + 1, dtype=np.int64)
            np.cumsum(pos_lens, out=pos_off[1:])
        terms.append(term)
        payloads.append(
            codec.encode_postings(docs, tfs, norms, pos_data=pos_data, pos_off=pos_off)
        )
        dfs.append(int(len(docs)))
        ttfs.append(int(tfs.sum()))
        max_tfs.append(int(tfs.max()))
    for r in readers:
        r.close()
    seg_dir = os.path.join(index_dir, "segments", out_name)
    meta = write_segment(seg_dir, tkey, -1, terms, payloads, dfs, ttfs, max_tfs)
    meta["name"] = out_name
    return meta


def plan_merges(
    segments: list[dict], target_per_tkey: int, merge_factor: int
) -> list[tuple[int, list[dict], str, list[dict]]]:
    """Pure planning (deterministic, unit-testable): per tkey, repeatedly
    fold the merge_factor smallest segments until <= target remain.

    Returns [(tkey, final_segment_entries, ...)]-style merge steps:
    (tkey, sources, out_name, remaining_after).
    """
    steps = []
    by_tkey: dict[int, list[dict]] = {}
    for s in segments:
        by_tkey.setdefault(s["tkey"], []).append(dict(s))
    for tkey, segs in sorted(by_tkey.items()):
        gen = 0
        while len(segs) > target_per_tkey:
            segs.sort(key=lambda s: (s["bytes"], s["name"]))
            n = min(merge_factor, len(segs) - target_per_tkey + 1)
            sources = segs[:n]
            out_name = f"seg-{tkey:05d}-m{gen:04d}"
            while any(s["name"] == out_name for s in segs):
                gen += 1
                out_name = f"seg-{tkey:05d}-m{gen:04d}"
            placeholder = {
                "tkey": tkey,
                "salt": -1,
                "name": out_name,
                "bytes": sum(s["bytes"] for s in sources),
                "n_terms": 0,
                "n_postings": sum(s["n_postings"] for s in sources),
                "skey": -1,
            }
            steps.append((tkey, sources, out_name, None))
            segs = segs[n:] + [placeholder]
            gen += 1
    return steps


def merge_segments(
    index_dir: str,
    target_per_tkey: int = 1,
    merge_factor: int = 10,
    purge_deletes: bool = False,
) -> dict:
    """Run the tiered merge as a Ray Data stage; returns the new manifest.

    With ``purge_deletes`` the merge physically drops tombstoned postings,
    recomputes the live collection stats (docCount, sumTotalTermFreq) and
    clears the tombstone file — Lucene's delete reclamation. Scores change
    accordingly (stats now reflect live docs only), as in Lucene."""
    import ray.data as rd

    from apache___solr_ray.deletes import (
        clear_tombstones,
        load_tombstones,
        record_purged,
        tombstoned_doc_lens,
    )

    man = read_json(os.path.join(index_dir, "index_manifest.json"))
    if man is None:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    tombs = load_tombstones(index_dir) if purge_deletes else None
    segments = [dict(s) for s in man["segments"]]
    for s in segments:
        s.setdefault("name", f"seg-{s['tkey']:05d}-{s['salt']:05d}")
    if purge_deletes and (tombs is None or len(tombs) == 0):
        purge_deletes = False
        tombs = None
    if purge_deletes:
        # purging must touch EVERY segment: force a full merge per tkey,
        # including self-rewrites of tkeys that already hold one segment
        steps = plan_merges(segments, 1, max(merge_factor, len(segments) + 1))
        planned = {st[0] for st in steps}
        for tkey in sorted({s["tkey"] for s in segments} - planned):
            srcs = [s for s in segments if s["tkey"] == tkey]
            gen = 0
            out_name = f"seg-{tkey:05d}-m{gen:04d}"
            while any(s["name"] == out_name for s in srcs):
                gen += 1
                out_name = f"seg-{tkey:05d}-m{gen:04d}"
            steps.append((tkey, srcs, out_name, []))
    else:
        steps = plan_merges(segments, target_per_tkey, merge_factor)
    if not steps:
        return man

    # one task per merge step; steps within a tkey chain (later steps may
    # consume earlier outputs), so group steps by tkey and run each tkey's
    # chain inside one task — tkeys merge in parallel, chains stay ordered.
    by_tkey: dict[int, list] = {}
    for st in steps:
        by_tkey.setdefault(st[0], []).append(st)

    def run_tkey(batch: pa.Table) -> pa.Table:
        import json as _json

        out = []
        for i in range(batch.num_rows):
            tkey = int(batch.column("tkey")[i].as_py())
            chain = _json.loads(batch.column("steps")[i].as_py())
            for _, sources, out_name, _ in chain:
                meta = _merge_group(index_dir, tkey, sources, out_name, tombs=tombs)
                out.append(meta)
        return pa.table(
            {
                "name": pa.array([m["name"] for m in out], pa.string()),
                "tkey": pa.array([m["tkey"] for m in out], pa.int64()),
                "n_terms": pa.array([m["n_terms"] for m in out], pa.int64()),
                "n_postings": pa.array([m["n_postings"] for m in out], pa.int64()),
                "bytes": pa.array([m["bytes"] for m in out], pa.int64()),
            }
        )

    import json as _json

    ds = rd.from_arrow(
        pa.table(
            {
                "tkey": pa.array(list(by_tkey.keys()), pa.int64()),
                "steps": pa.array([_json.dumps(v) for v in by_tkey.values()], pa.string()),
            }
        )
    ).repartition(len(by_tkey))
    merged = ds.map_batches(run_tkey, batch_format="pyarrow", batch_size=1).take_all()
    merged_by_name = {m["name"]: m for m in merged}

    consumed = {s["name"] for st in steps for s in st[1]}
    survivors = [s for s in segments if s["name"] not in consumed]
    # merged lineage = digest of the source lineages (chains fold in step
    # order), so index_fingerprint keeps digesting content identity across
    # merges rather than falling back to counts-only
    import hashlib as _hashlib

    lineage_by_name = {s["name"]: str(s.get("lineage", "")) for s in segments}
    for _, sources, out_name, _ in steps:
        combined = "+".join(
            lineage_by_name.get(s["name"], str(s.get("name", ""))) for s in sources
        )
        lineage_by_name[out_name] = "m:" + _hashlib.sha1(combined.encode()).hexdigest()
    new_entries = [
        {
            "skey": -1,
            "tkey": int(m["tkey"]),
            "salt": -1,
            "name": n,
            "n_terms": int(m["n_terms"]),
            "n_postings": int(m["n_postings"]),
            "bytes": int(m["bytes"]),
            "lineage": lineage_by_name.get(n, ""),
        }
        for n, m in merged_by_name.items()
        if n not in consumed  # intermediate merge outputs may themselves be consumed
    ]
    man = dict(man)
    man["segments"] = sorted(survivors + new_entries, key=lambda s: (s["tkey"], s["name"]))
    stats = dict(man["stats"])
    stats["n_segments"] = len(man["segments"])
    if purge_deletes:
        # live stats after reclaiming deletes (Lucene per-segment stats of
        # the merged index): remove the tombstoned docs' contribution
        n_del, len_del = tombstoned_doc_lens(index_dir, tombs)
        stats["doc_count"] = int(stats["doc_count"]) - n_del
        stats["sum_total_tf"] = int(stats["sum_total_tf"]) - len_del
    man["stats"] = stats
    write_json_atomic(os.path.join(index_dir, "index_manifest.json"), man)
    if purge_deletes:
        # postings_raw still holds the reclaimed docs; a later rebuild from
        # it must not resurrect them — persist the purge in the ledger that
        # build_index re-applies (deletes.reapply_purged) before clearing
        # the live tombstone mask
        record_purged(index_dir, tombs, man.get("input_fingerprints") or [])
        clear_tombstones(index_dir)
    # only after the commit point moves do we delete consumed segments
    for name in consumed:
        shutil.rmtree(os.path.join(index_dir, "segments", name), ignore_errors=True)
    return man
