"""Tiered merge: layout changes, content (query results) bit-identical."""

import os

import numpy as np
import pytest

from apache___solr_ray.build import IndexConfig, build_index
from apache___solr_ray.corpus import write_pages
from apache___solr_ray.merge import merge_segments, plan_merges
from apache___solr_ray.query import IndexReader

QUERIES = ["the fast data", "example.com", "DON'T Stop", "state of the art merge"]


def test_plan_merges_tiers():
    segs = [
        {"tkey": 0, "salt": i, "name": f"seg-00000-{i:05d}", "bytes": 100 * (i + 1), "n_terms": 1, "n_postings": 10, "skey": i}
        for i in range(12)
    ]
    steps = plan_merges(segs, target_per_tkey=1, merge_factor=10)
    # 12 -> merge 10 smallest -> 3 -> merge 3 -> 1
    assert len(steps) == 2
    assert len(steps[0][1]) == 10
    assert len(steps[1][1]) == 3
    assert steps[0][2] != steps[1][2]
    steps2 = plan_merges(segs, target_per_tkey=4, merge_factor=10)
    assert len(steps2) == 1 and len(steps2[0][1]) == 9  # 12 -> 4


def test_plan_merges_noop():
    segs = [{"tkey": 0, "salt": 0, "name": "a", "bytes": 1, "n_terms": 1, "n_postings": 1, "skey": 0}]
    assert plan_merges(segs, 1, 10) == []


@pytest.fixture(scope="module")
def merged_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    write_pages(d, 500, seed=42, rows_per_file=128)
    idx = str(tmp_path_factory.mktemp("index"))
    # small max_postings_per_segment -> many doc-range sub-segments to merge
    cfg = IndexConfig(
        term_partitions=3, target_docs_per_part=128, max_postings_per_segment=4000
    )
    build_index(d, idx, cfg)
    r = IndexReader(idx)
    before = {q: r.topk(q, 10) for q in QUERIES}
    before_terms = {}
    for q in ["the", "example.com"]:
        tp = r.term_postings(q)
        if tp:
            before_terms[q] = (tp.df, tp.ttf, tp.decode_all())
    r.close()
    n_before = len(r.manifest["segments"])
    man = merge_segments(idx, target_per_tkey=1, merge_factor=4)
    return idx, before, before_terms, n_before, man


def test_merge_reduces_segments(merged_index):
    idx, _, _, n_before, man = merged_index
    assert len(man["segments"]) < n_before
    per_tkey = {}
    for s in man["segments"]:
        per_tkey[s["tkey"]] = per_tkey.get(s["tkey"], 0) + 1
    assert all(v == 1 for v in per_tkey.values())
    # consumed segment dirs are gone; survivors exist
    names_on_disk = set(os.listdir(os.path.join(idx, "segments")))
    assert {s["name"] for s in man["segments"]} == names_on_disk


def test_merge_preserves_results(merged_index):
    idx, before, before_terms, _, _ = merged_index
    r = IndexReader(idx)
    for q, (d0, s0) in before.items():
        d1, s1 = r.topk(q, 10)
        assert d0.tolist() == d1.tolist(), q
        assert s0.tolist() == s1.tolist(), q
    for term, (df0, ttf0, (docs0, tfs0, norms0)) in before_terms.items():
        tp = r.term_postings(term)
        assert (tp.df, tp.ttf) == (df0, ttf0)
        docs1, tfs1, norms1 = tp.decode_all()
        assert np.array_equal(docs0, docs1)
        assert np.array_equal(tfs0, tfs1)
        assert np.array_equal(norms0, norms1)


def test_deletes_tombstone_and_purge(ray_session, tmp_path_factory):
    """DeleteStream semantics: tombstoned docs stop matching immediately
    with UNCHANGED stats/scores for the others (Lucene liveDocs); a merge
    with purge_deletes reclaims the postings, updates live stats and clears
    tombstones."""
    import numpy as np

    from apache___solr_ray.deletes import delete_by_url, load_tombstones
    from apache___solr_ray.merge import merge_segments

    d = str(tmp_path_factory.mktemp("pages_del"))
    write_pages(d, 400, seed=42, rows_per_file=128)
    idx = str(tmp_path_factory.mktemp("index_del"))
    cfg = IndexConfig(term_partitions=3, target_docs_per_part=128, max_postings_per_segment=5000)
    build_index(d, idx, cfg)

    r0 = IndexReader(idx)
    q_ = "the fast data"
    d0, s0 = r0.topk(q_, 10)
    victims = r0.urls_for(d0[:3])
    n_new = delete_by_url(idx, victims)
    assert n_new == 3

    r1 = IndexReader(idx)
    d1, s1 = r1.topk(q_, 10)
    # deleted docs gone; surviving ranks = old ranking minus victims
    assert not set(d0[:3].tolist()) & set(d1.tolist())
    d0_all, s0_all = r0.topk_exhaustive(q_, 10**9)
    keep = ~np.isin(d0_all, d0[:3])
    assert d1.tolist() == d0_all[keep][:10].tolist()
    assert s1.tolist() == s0_all[keep][:10].tolist()  # stats/scores unchanged
    # blockmax == exhaustive under tombstones
    d1e, s1e = r1.topk_exhaustive(q_, 10)
    assert d1.tolist() == d1e.tolist() and s1.tolist() == s1e.tolist()
    # match_docs excludes
    assert not set(d0[:3].tolist()) & set(r1.match_docs(q_, "or").tolist())

    # purge
    man = merge_segments(idx, purge_deletes=True)
    assert len(load_tombstones(idx)) == 0
    assert man["stats"]["doc_count"] == 400 - 3
    r2 = IndexReader(idx)
    # tombstone file empty, no reader-side masking active, yet the docs are
    # physically absent from every term's postings
    assert len(r2.tombstones) == 0
    for term in ("the", "fast", "data"):
        tp = r2.term_postings(term)
        if tp is not None:
            docs_t, _, _ = tp.decode_all()
            assert not set(d0[:3].tolist()) & set(docs_t.tolist()), term
    d2, s2 = r2.topk(q_, 10)
    assert not set(d0[:3].tolist()) & set(d2.tolist())
    # same doc order as tombstoned view (scores differ: live stats)
    assert d2.tolist() == d1.tolist()


def test_purge_survives_rebuild(ray_session, tmp_path_factory):
    """Durable deletes: after merge_segments(purge_deletes=True), the corpus
    and postings_raw still contain the reclaimed docs — a later append +
    build_index rebuilds segments from postings_raw and must NOT resurrect
    them. The purge ledger (deletes.record_purged) re-applies the deletes
    as tombstones at the next commit (reapply_purged)."""
    from apache___solr_ray.deletes import delete_by_url, load_tombstones
    from apache___solr_ray.merge import merge_segments

    d = str(tmp_path_factory.mktemp("pages_pr"))
    write_pages(d, 256, seed=42, rows_per_file=128)
    idx = str(tmp_path_factory.mktemp("index_pr"))
    cfg = IndexConfig(term_partitions=2, target_docs_per_part=128, max_postings_per_segment=5000)
    build_index(d, idx, cfg)

    r0 = IndexReader(idx)
    q_ = "the fast data"
    d0, _ = r0.topk(q_, 10)
    victims = r0.urls_for(d0[:2])
    assert delete_by_url(idx, victims) == 2
    merge_segments(idx, purge_deletes=True)
    assert len(load_tombstones(idx)) == 0  # physically reclaimed

    # append new docs -> build_index rebuilds segments from postings_raw,
    # which still carries the purged docs
    write_pages(d, 384, seed=42, rows_per_file=128)
    man = build_index(d, idx, cfg)
    assert man["metrics"].get("tombstones_reapplied") == 2

    r1 = IndexReader(idx)
    hits = set(r1.match_docs(q_, "or").tolist())
    assert not set(d0[:2].tolist()) & hits, "purged docs resurrected by rebuild"
    dd, _ = r1.topk(q_, 20)
    assert not set(d0[:2].tolist()) & set(dd.tolist())
    # the re-applied tombstones are live again until the next purge
    assert set(load_tombstones(idx).tolist()) == set(d0[:2].tolist())

    # second purge reclaims them again and the ledger stays consistent
    merge_segments(idx, purge_deletes=True)
    r2 = IndexReader(idx)
    assert not set(d0[:2].tolist()) & set(r2.match_docs(q_, "or").tolist())


def test_upsert_overwrite_by_uniquekey(ray_session, tmp_path_factory):
    """updateDocument semantics: upserting an existing url replaces its
    content atomically — old version stops matching, new version serves,
    untouched partitions resume."""
    import pyarrow as pa

    from apache___solr_ray.corpus import pages_table
    from apache___solr_ray.update import upsert_pages

    d = str(tmp_path_factory.mktemp("pages_ups"))
    write_pages(d, 256, seed=42, rows_per_file=128)
    idx = str(tmp_path_factory.mktemp("index_ups"))
    cfg = IndexConfig(term_partitions=2, target_docs_per_part=128, text_from_html=False)
    build_index(d, idx, cfg)

    r0 = IndexReader(idx)
    target = r0.urls_for(np.array([5], dtype=np.int64))[0]
    assert len(r0.match_docs("zzupdatedtoken", "or")) == 0

    new = pa.table(
        {
            "url": pa.array([target], pa.string()),
            "text": pa.array(["zzupdatedtoken fresh content body"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    man = upsert_pages(d, idx, new, cfg)
    assert man["metrics"]["parts_resumed"] >= 2  # old partitions untouched

    r1 = IndexReader(idx)
    hits = r1.match_docs("zzupdatedtoken", "or")
    assert len(hits) == 1
    assert r1.urls_for(hits)[0] == target  # same uniqueKey, new content
    # the OLD doc id (5) no longer matches anything
    assert 5 not in r1.match_docs("the", "or").tolist()
    # and the new doc serves through BM25
    dd, ss = r1.topk("zzupdatedtoken", 5)
    assert dd.tolist() == hits.tolist()


def test_atomic_updates_set_inc_add_remove(ray_session, tmp_path_factory):
    """AtomicUpdateDocumentMerger semantics (reference AtomicUpdatesTest):
    set replaces, inc adds numerically, add/remove edit a multivalued list;
    the merged doc reindexes through the overwrite path, untouched
    partitions resume, and the stored merged values round-trip."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from apache___solr_ray.update import _fetch_stored, atomic_update

    d = str(tmp_path_factory.mktemp("pages_atomic"))
    # corpus with extra stored fields: numeric views + multivalued tags
    t = pa.table(
        {
            "url": pa.array([f"u://{i}" for i in range(64)], pa.string()),
            "text": pa.array([f"body token{i} shared" for i in range(64)], pa.string()),
            "lang": pa.array(["en"] * 64, pa.string()),
            "views": pa.array([10] * 64, pa.int64()),
            "tags": pa.array([["a", "b"]] * 64, pa.list_(pa.string())),
        }
    )
    pq_.write_table(t, f"{d}/pages-000000.parquet", row_group_size=32)
    idx = str(tmp_path_factory.mktemp("index_atomic"))
    cfg = IndexConfig(term_partitions=2, target_docs_per_part=32, text_from_html=False)
    build_index(d, idx, cfg)

    man = atomic_update(
        d,
        idx,
        [
            {
                "url": "u://5",
                "text": {"set": "zzatomictoken replaced body"},
                "views": {"inc": 7},
                "tags": {"add": "c"},
            },
            {"url": "u://9", "views": {"inc": -3}, "tags": {"remove": "a"}},
        ],
        cfg,
    )
    assert man["metrics"]["parts_resumed"] >= 1  # old partitions untouched

    r = IndexReader(idx)
    hits = r.match_docs("zzatomictoken", "or")
    assert r.urls_for(hits) == ["u://5"]
    # u://9 text unchanged -> still matches its original token
    assert len(r.match_docs("token9", "or")) == 1

    stored = _fetch_stored(d, ["u://5", "u://9"])
    by = {row["url"]: row for row in stored.to_pylist()}
    assert by["u://5"]["views"] == 17 and by["u://5"]["tags"] == ["a", "b", "c"]
    assert by["u://5"]["text"].startswith("zzatomictoken")
    assert by["u://9"]["views"] == 7 and by["u://9"]["tags"] == ["b"]

    # strict form: unknown uniqueKey raises
    import pytest as _pytest

    with _pytest.raises(KeyError):
        atomic_update(d, idx, [{"url": "u://nope", "views": {"inc": 1}}], cfg)

    # optimistic concurrency (Solr _version_ / 409 semantics): u://5 was
    # updated once above -> version 2; a writer that read version 1 must
    # be rejected BEFORE any write, a correct version passes and bumps
    from apache___solr_ray.update import VersionConflict, doc_versions

    vs = doc_versions(d, ["u://5", "u://9", "u://3"])
    assert vs == {"u://5": 2, "u://9": 2, "u://3": 1}
    with _pytest.raises(VersionConflict):
        atomic_update(
            d, idx, [{"url": "u://5", "views": {"inc": 1}}], cfg,
            require_versions={"u://5": 1},
        )
    assert doc_versions(d, ["u://5"]) == {"u://5": 2}  # rejected batch wrote nothing
    atomic_update(
        d, idx, [{"url": "u://5", "views": {"inc": 1}}], cfg,
        require_versions={"u://5": 2},
    )
    assert doc_versions(d, ["u://5"]) == {"u://5": 3}
    stored2 = _fetch_stored(d, ["u://5"])
    assert stored2.to_pylist()[0]["views"] == 18


def test_index_fingerprint_peersync(ray_session, tmp_path_factory):
    """IndexFingerprint semantics (reference IndexFingerprint.java /
    PeerSync): same inputs+config fingerprint identically across separate
    builds; deletes and appends diverge it."""
    from apache___solr_ray.deletes import delete_by_url
    from apache___solr_ray.manifest import index_fingerprint

    d = str(tmp_path_factory.mktemp("pages_fp"))
    write_pages(d, 256, seed=42, rows_per_file=128)
    cfg = IndexConfig(term_partitions=2, target_docs_per_part=128, text_from_html=False)
    idx_a = str(tmp_path_factory.mktemp("index_fp_a"))
    idx_b = str(tmp_path_factory.mktemp("index_fp_b"))
    build_index(d, idx_a, cfg)
    build_index(d, idx_b, cfg)
    fp_a, fp_b = index_fingerprint(idx_a), index_fingerprint(idx_b)
    assert fp_a == fp_b  # replicas in sync

    r = IndexReader(idx_a)
    delete_by_url(idx_a, [r.urls_for(np.array([3], dtype=np.int64))[0]])
    assert index_fingerprint(idx_a) != fp_b  # delete diverges

    write_pages(d, 384, seed=42, rows_per_file=128)  # append a partition
    build_index(d, idx_b, cfg)
    assert index_fingerprint(idx_b) != fp_b  # append diverges


def test_unapplied_tombstones_surface_in_build_stats(ray_session, tmp_path_factory):
    """Purge-ledger partitions whose input fingerprint is NOT in the
    current layout (stale fp or the unknown-partition sentinel) must
    surface as metrics.tombstones_unapplied in the commit manifest — a
    loud count, not just a warning (round-4 advice)."""
    import json
    import os
    import warnings

    from apache___solr_ray.deletes import PURGED_FILE, delete_by_url
    from apache___solr_ray.merge import merge_segments

    d = str(tmp_path_factory.mktemp("pages_ua"))
    write_pages(d, 256, seed=7, rows_per_file=128)
    idx = str(tmp_path_factory.mktemp("index_ua"))
    cfg = IndexConfig(term_partitions=2, target_docs_per_part=128, max_postings_per_segment=5000)
    build_index(d, idx, cfg)

    r0 = IndexReader(idx)
    d0, _ = r0.topk("the fast data", 10)
    assert delete_by_url(idx, r0.urls_for(d0[:2])) == 2
    merge_segments(idx, purge_deletes=True)

    # tamper: add a stale-fingerprint partition and sentinel rows
    p = os.path.join(idx, PURGED_FILE)
    led = json.load(open(p))
    led["by_fp"]["deadbeef-not-a-current-partition"] = [0, 1, 2]
    led["by_fp"]["__unknown_partition__"] = [999]
    json.dump(led, open(p, "w"))

    write_pages(d, 384, seed=7, rows_per_file=128)  # force a real rebuild
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        man = build_index(d, idx, cfg)
    assert man["metrics"].get("tombstones_reapplied") == 2
    assert man["metrics"].get("tombstones_unapplied") == 4  # 3 stale + 1 sentinel
