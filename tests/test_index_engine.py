"""End-to-end index build + BM25 query conformance (FIXTURES.md invariants 3-6).

The oracle here is an independent single-partition brute-force scorer that
shares only the frozen math module (lucene.py) with the engine — the
"control" side of the reference's BaseDistributedSearchTestCase pattern.
"""

import json
import os
import shutil
from collections import Counter

import numpy as np
import pytest

from apache___solr_ray.analyze import Analyzer
from apache___solr_ray.build import IndexConfig, build_index, plan_partitions
from apache___solr_ray.corpus import pages_table, write_pages
from apache___solr_ray.lucene import BM25Scorer, int_to_byte4_array
from apache___solr_ray.query import IndexReader, TopKQueryActor, merge_topk, scatter_gather_topk

N_DOCS = 600
ROWS_PER_FILE = 256
QUERIES = [
    "the fast data",
    "zaku",                     # likely head-ish synthetic term
    "example.com",
    "DON'T Stop",               # case + apostrophe through the chain
    "no_such_term_xyzzy",
    "state of the art pipeline merge",
    "3.14 1,000",
    "http https utf-8",
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    write_pages(d, N_DOCS, seed=42, rows_per_file=ROWS_PER_FILE)
    return d


@pytest.fixture(scope="module")
def built(ray_session, corpus_dir, tmp_path_factory):
    """Storage-shuffle build with doc-range splitting forced (small
    max_postings_per_segment => salted sub-segments exist)."""
    idx = str(tmp_path_factory.mktemp("index"))
    cfg = IndexConfig(
        term_partitions=4,
        target_docs_per_part=ROWS_PER_FILE,
        shuffle="storage",
        max_postings_per_segment=6000,
    )
    man = build_index(corpus_dir, idx, cfg)
    return idx, cfg, man


@pytest.fixture(scope="module")
def built_ray(ray_session, corpus_dir, tmp_path_factory):
    """Object-store (groupby) shuffle build with head-term salting forced."""
    idx = str(tmp_path_factory.mktemp("index_ray"))
    cfg = IndexConfig(
        term_partitions=4,
        salt_threshold=120,
        target_docs_per_part=ROWS_PER_FILE,
        shuffle="ray",
    )
    man = build_index(corpus_dir, idx, cfg)
    return idx, cfg, man


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    """Brute-force scorer over the raw corpus with engine-identical doc ids."""
    pages = pages_table(N_DOCS, seed=42)
    parts = plan_partitions(
        sorted(os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)), ROWS_PER_FILE
    )
    doc_ids = np.concatenate(
        [(p["part_id"] << 32) + np.arange(p["n_rows"], dtype=np.int64) for p in parts]
    )
    analyzer = Analyzer()
    toks = [analyzer.analyze(t) for t in pages.column("text").to_pylist()]
    doc_len = np.array([len(t) for t in toks], dtype=np.int64)
    norms = int_to_byte4_array(doc_len)
    doc_count = len(toks)
    sum_tf = int(doc_len.sum())
    tf_maps = [Counter(t) for t in toks]
    df = Counter()
    for m in tf_maps:
        df.update(m.keys())

    def topk(query, k=10):
        q = Counter(analyzer.analyze(query))
        acc: dict[int, float] = {}
        for term, boost in q.items():
            if df[term] == 0:
                continue
            sc = BM25Scorer(df[term], doc_count, sum_tf, boost=float(boost))
            for i, m in enumerate(tf_maps):
                tf = m.get(term)
                if tf:
                    s = float(
                        sc.score(np.array([tf]), np.array([norms[i]], dtype=np.uint8))[0]
                    )
                    acc[i] = acc.get(i, 0.0) + s  # float64 accumulate
        items = [(int(doc_ids[i]), np.float32(v)) for i, v in acc.items()]
        items.sort(key=lambda x: (-x[1], x[0]))
        items = items[:k]
        return (
            np.array([d for d, _ in items], dtype=np.int64),
            np.array([s for _, s in items], dtype=np.float32),
        )

    return topk


def test_build_commits(built):
    idx, cfg, man = built
    assert os.path.exists(os.path.join(idx, "index_manifest.json"))
    assert man["stats"]["doc_count"] == N_DOCS
    assert man["metrics"]["n_docs"] == N_DOCS
    assert len(man["segments"]) >= 1
    assert any(s["salt"] > 0 for s in man["segments"])  # doc-range splitting exercised


def test_ray_shuffle_plan_matches_storage_plan(built, built_ray):
    """The two physical shuffle plans must produce identical query results
    (the control-vs-distributed identity, across *plans*)."""
    idx_s, _, man_ray = built[0], built[1], built_ray[2]
    assert len(man_ray["stats"]["head_terms"]) > 0  # head salting exercised
    r_s = IndexReader(idx_s)
    r_r = IndexReader(built_ray[0])
    for q in QUERIES:
        d1, s1 = r_s.topk(q, 10)
        d2, s2 = r_r.topk(q, 10)
        assert d1.tolist() == d2.tolist(), q
        assert s1.tolist() == s2.tolist(), q


def test_rank_and_score_parity_vs_oracle(built, oracle):
    idx, _, _ = built
    r = IndexReader(idx)
    for q in QUERIES:
        want_d, want_s = oracle(q, 10)
        got_d, got_s = r.topk_exhaustive(q, 10)
        assert got_d.tolist() == want_d.tolist(), f"doc ids differ for {q!r}"
        assert got_s.tolist() == want_s.tolist(), f"scores differ for {q!r} (must be bit-identical)"


def test_blockmax_equals_exhaustive(built):
    idx, _, _ = built
    r = IndexReader(idx)
    for q in QUERIES:
        d1, s1 = r.topk_exhaustive(q, 10)
        d2, s2 = r.topk(q, 10)
        assert d1.tolist() == d2.tolist(), q
        assert s1.tolist() == s2.tolist(), q


def test_scatter_gather_equals_single(built):
    idx, _, _ = built
    r = IndexReader(idx)
    for q in QUERIES[:4]:
        d1, s1 = r.topk(q, 10)
        d2, s2 = scatter_gather_topk(idx, q, 10, n_shards=3)
        assert d1.tolist() == d2.tolist()
        assert s1.tolist() == s2.tolist()


def test_control_vs_distributed_partitioning(ray_session, corpus_dir, built, tmp_path_factory):
    """1-partition control build == N-partition build (identical results)."""
    idx_n, _, _ = built
    idx_1 = str(tmp_path_factory.mktemp("index1"))
    cfg1 = IndexConfig(term_partitions=1, salt_threshold=10**9, target_docs_per_part=10**6)
    build_index(corpus_dir, idx_1, cfg1)
    rn, r1 = IndexReader(idx_n), IndexReader(idx_1)
    for q in QUERIES:
        dn, sn = rn.topk(q, 10)
        d1, s1 = r1.topk(q, 10)
        # doc ids differ across partitionings; urls and scores must not
        assert sn.tolist() == s1.tolist(), q
        # compare url sets per score level (tie order may legally differ)
        un, u1 = rn.urls_for(dn), r1.urls_for(d1)
        by_score_n, by_score_1 = {}, {}
        for s, u in zip(sn.tolist(), un):
            by_score_n.setdefault(s, set()).add(u)
        for s, u in zip(s1.tolist(), u1):
            by_score_1.setdefault(s, set()).add(u)
        assert by_score_n == by_score_1, q


def test_resume_skips_completed_partitions(ray_session, corpus_dir, built, tmp_path_factory):
    idx, cfg, man0 = built
    # full skip: identical config + input -> committed manifest returned
    man1 = build_index(corpus_dir, idx, cfg)
    assert man1["segments"] == man0["segments"]
    # partial resume: remove the commit point and one segment, rebuild
    os.remove(os.path.join(idx, "index_manifest.json"))
    seg0 = os.path.join(idx, "segments", sorted(os.listdir(os.path.join(idx, "segments")))[0])
    shutil.rmtree(seg0)
    man2 = build_index(corpus_dir, idx, cfg)
    assert man2["metrics"]["parts_resumed"] == man2["stats"]["n_doc_parts"]  # no re-tokenize
    assert man2["segments"] == man0["segments"]
    r = IndexReader(idx)
    d, s = r.topk(QUERIES[0], 10)
    assert len(d) > 0


def test_determinism_two_builds(ray_session, corpus_dir, built, tmp_path_factory):
    idx_a, cfg, man_a = built
    idx_b = str(tmp_path_factory.mktemp("indexb"))
    man_b = build_index(corpus_dir, idx_b, cfg)
    assert man_a["segments"] == man_b["segments"]
    assert man_a["stats"] == man_b["stats"]
    assert man_a["input_fingerprints"] == man_b["input_fingerprints"]


def test_query_actor_batch(ray_session, built):
    import ray.data as rd

    idx, _, _ = built
    qds = rd.from_items(
        [{"qid": i, "query": q, "k": 5} for i, q in enumerate(QUERIES)]
    )
    out = qds.map_batches(
        TopKQueryActor,
        fn_constructor_kwargs={"index_dir": idx},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    ).take_all()
    by_qid = {}
    for row in out:
        by_qid.setdefault(row["qid"], []).append(row)
    r = IndexReader(idx)
    for qid, rows in by_qid.items():
        rows.sort(key=lambda x: x["rank"])
        d, s = r.topk(QUERIES[qid], 5)
        assert [row["doc_id"] for row in rows] == d.tolist()
        assert [np.float32(row["score"]) for row in rows] == s.tolist()


def test_merge_topk_tiebreak():
    a = (np.array([5, 1]), np.array([2.0, 1.0], dtype=np.float32))
    b = (np.array([3]), np.array([2.0], dtype=np.float32))
    d, s = merge_topk([a, b], 3)
    assert d.tolist() == [3, 5, 1]  # score desc, doc asc on the tie


def test_incremental_append_build(ray_session, tmp_path_factory):
    """Appending new Parquet partitions and re-running the build must (a)
    not re-tokenize old partitions (phase-A manifests), (b) reuse every
    segment whose (tkey, salt) doc-range chunk is unchanged — the storage
    shuffle's chunking is prefix-stable because new parts only append to
    the end of each bucket's part sequence (the TieredMergePolicy-style
    incremental path, SURVEY §2.9 / §7.1 step 9)."""
    import json

    d = str(tmp_path_factory.mktemp("pages_inc"))
    write_pages(d, 384, seed=42, rows_per_file=128)
    idx = str(tmp_path_factory.mktemp("index_inc"))
    cfg = IndexConfig(
        term_partitions=4, target_docs_per_part=128, max_postings_per_segment=6000
    )
    man1 = build_index(d, idx, cfg)
    segs1 = {s["name"]: s for s in man1["segments"]}

    # append one more file of new docs (ids 384..511)
    write_pages(d, 512, seed=42, rows_per_file=128)
    man2 = build_index(d, idx, cfg)

    assert man2["metrics"]["parts_resumed"] == 3  # the 3 old parts
    assert man2["stats"]["doc_count"] == 512
    # the strictly-full old chunks survive byte-identical; only each
    # bucket's tail chunk (+ new chunks) rebuilt
    segs2 = {s["name"]: s for s in man2["segments"]}
    reused = [n for n in segs1 if n in segs2 and segs1[n] == segs2[n]]
    assert len(reused) >= 1, "no segment reused on append"

    # correctness after append == fresh build of the full corpus
    idx_fresh = str(tmp_path_factory.mktemp("index_fresh"))
    build_index(d, idx_fresh, cfg)
    r_inc, r_fresh = IndexReader(idx), IndexReader(idx_fresh)
    for q_ in QUERIES:
        d1, s1 = r_inc.topk(q_, 10)
        d2, s2 = r_fresh.topk(q_, 10)
        assert d1.tolist() == d2.tolist(), q_
        assert s1.tolist() == s2.tolist(), q_


def test_boolean_and_and_filtered_topk(built, corpus_dir):
    """AND-match set and filtered (fq) top-k vs brute force over the raw
    corpus — the q+fq and required-clause request shapes."""
    idx, _, _ = built
    r = IndexReader(idx)
    pages = pages_table(N_DOCS, seed=42)
    analyzer = Analyzer()
    toks = [set(analyzer.analyze(t)) for t in pages.column("text").to_pylist()]
    langs = pages.column("lang").to_pylist()
    parts = plan_partitions(
        sorted(os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)), ROWS_PER_FILE
    )
    doc_ids = np.concatenate(
        [(p["part_id"] << 32) + np.arange(p["n_rows"], dtype=np.int64) for p in parts]
    )

    # AND semantics
    q_and = "the data"
    terms = set(analyzer.analyze(q_and))
    want = sorted(int(doc_ids[i]) for i, tk in enumerate(toks) if terms <= tk)
    got = sorted(int(x) for x in r.match_docs(q_and, mode="and"))
    assert got == want

    # OR semantics
    want_or = sorted(int(doc_ids[i]) for i, tk in enumerate(toks) if terms & tk)
    got_or = sorted(int(x) for x in r.match_docs(q_and, mode="or"))
    assert got_or == want_or

    # filtered top-k: rank only lang == 'en'; equals unfiltered rank
    # computed over the en-subset by exhaustive scoring
    allowed = r.doc_filter_mask("lang", "en")
    for q_ in QUERIES[:4]:
        d_f, s_f = r.topk_filtered(q_, 10, allowed)
        # every hit is en
        for d in d_f:
            part, row = int(d) >> 32, int(d) & 0xFFFFFFFF
            # recompute lang from the corpus row order
            gidx = int(np.flatnonzero(doc_ids == d)[0])
            assert langs[gidx] == "en", q_
        # and no non-filtered doc with a better score was skipped wrongly:
        d_all, s_all = r.topk_exhaustive(q_, 10**9)
        mask = allowed(d_all)
        d_e, s_e = d_all[mask][:10], s_all[mask][:10]
        assert d_f.tolist() == d_e.tolist(), q_
        assert s_f.tolist() == s_e.tolist(), q_


def test_grouped_topk(built, corpus_dir):
    """Result grouping: per-lang top-3 equals brute-force per-lang ranking."""
    idx, _, _ = built
    r = IndexReader(idx)
    pages = pages_table(N_DOCS, seed=42)
    langs = pages.column("lang").to_pylist()
    parts = plan_partitions(
        sorted(os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)), ROWS_PER_FILE
    )
    doc_ids = np.concatenate(
        [(p["part_id"] << 32) + np.arange(p["n_rows"], dtype=np.int64) for p in parts]
    )
    lang_of = {int(d): langs[i] for i, d in enumerate(doc_ids)}
    q_ = "the fast data"
    groups = r.grouped_topk(q_, "lang", k_per_group=3)
    d_all, s_all = r.topk_exhaustive(q_, 10**9)
    for g, (dg, sg) in groups.items():
        mask = np.array([lang_of[int(d)] == g for d in d_all])
        want_d = d_all[mask][:3]
        want_s = s_all[mask][:3]
        assert dg.tolist() == want_d.tolist(), g
        assert sg.tolist() == want_s.tolist(), g
    assert set(groups) == {lang_of[int(d)] for d in d_all}


def test_topic_poll_incremental(ray_session, tmp_path_factory):
    """TopicStream semantics: poll, append new docs, re-poll from the
    checkpoint -> exactly the new matches, no replays."""
    d = str(tmp_path_factory.mktemp("pages_topic"))
    write_pages(d, 256, seed=42, rows_per_file=128)
    idx = str(tmp_path_factory.mktemp("index_topic"))
    cfg = IndexConfig(term_partitions=2, target_docs_per_part=128)
    build_index(d, idx, cfg)
    r1 = IndexReader(idx)
    q_ = "the"
    first, ckpt = r1.topic_poll(q_, checkpoint=-1, limit=10**6)
    assert len(first) > 0
    # append and rebuild (incremental: old parts resume)
    write_pages(d, 384, seed=42, rows_per_file=128)
    build_index(d, idx, cfg)
    r2 = IndexReader(idx)
    fresh, ckpt2 = r2.topic_poll(q_, checkpoint=ckpt, limit=10**6)
    allm = r2.match_docs(q_, "or")
    assert set(fresh.tolist()) == set(allm.tolist()) - set(first.tolist())
    assert all(x > ckpt for x in fresh.tolist())
    # third poll with nothing new
    again, ckpt3 = r2.topic_poll(q_, checkpoint=ckpt2, limit=10**6)
    assert len(again) == 0 and ckpt3 == ckpt2


def test_sharded_query_service(built):
    """ShardedQueryService (doc-range shard actors + mergeIds) must be
    rank- and score-identical to the single evaluator for every shard
    count."""
    from apache___solr_ray.query import ShardedQueryService

    idx, _, _ = built
    r = IndexReader(idx)
    for n_shards in (1, 2, 3):
        svc = ShardedQueryService(idx, n_shards=n_shards)
        svc.warmup()
        try:
            for q in QUERIES[:5]:
                d1, s1 = r.topk(q, 10)
                d2, s2 = svc.topk(q, 10)
                assert d1.tolist() == d2.tolist(), (n_shards, q)
                assert s1.tolist() == s2.tolist(), (n_shards, q)
        finally:
            svc.shutdown()


def test_fetch_fields_and_boosted_topk(built):
    """Stored-field retrieval for winners + function-query boosting."""
    idx, _, _ = built
    r = IndexReader(idx)
    d, s = r.topk("the fast data", 5)
    t = r.fetch_fields(d, ["url", "doc_len", "lang"])
    assert t.num_rows == len(d)
    assert t.column("url").to_pylist() == r.urls_for(d)

    # boost = 1/(1+doc_len/100): shorter docs win ties; verify vs brute
    def boost(doc_ids):
        lens = r.fetch_fields(doc_ids, ["doc_len"]).column("doc_len").to_numpy()
        return 1.0 / (1.0 + lens / 100.0)

    db, sb = r.topk_boosted("the fast data", 10, boost)
    d_all, s_all = r.topk_exhaustive("the fast data", 10**9)
    want = (s_all.astype(np.float64) * boost(d_all)).astype(np.float32)
    order = np.lexsort((d_all, -want.astype(np.float64)))[:10]
    assert db.tolist() == d_all[order].tolist()
    assert sb.tolist() == want[order].tolist()


def test_cursor_pages_equal_topk_prefix(built):
    """CursorMark pages concatenate to exactly the topk prefix — no skips,
    no repeats, ties broken identically (CursorMarkTest semantics)."""
    idx, _cfg, _man = built
    r = IndexReader(idx)
    for query in ["the fast data", "state of the art pipeline merge"]:
        want_d, want_s = r.topk_exhaustive(query, 21)
        got_d, got_s = [], []
        cursor = None
        for _ in range(3):
            d, s, cursor = r.cursor_page(query, 7, cursor)
            got_d.extend(d.tolist())
            got_s.extend(s.tolist())
            if cursor is None:
                break
        assert got_d == want_d[: len(got_d)].tolist()
        assert got_s == want_s[: len(got_s)].tolist()


def test_rerank_parity_vs_brute(ray_session):
    """index_rerank_topk (two-stage f64 rescore over the index) must equal
    a from-scratch brute re-rank computed directly on the raw tokenized
    corpus — an implementation-independent mirror of ReRank semantics."""
    import math
    import re

    import pyarrow.parquet as pq

    from apache___solr_ray.lucene import LENGTH_TABLE
    from apache___solr_ray.pipelines.indexq import (
        _RERANK_DOCS,
        _RERANK_MAIN,
        _RERANK_SECOND,
        _RERANK_WEIGHT,
        QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    got = QUERIES["index_rerank_topk"](sf).to_pandas()

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        int(d): re.findall(r"[a-z0-9]+", (x or "").lower())
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    lut = sorted({int(x) for x in LENGTH_TABLE})

    def qdl(dl):
        return max(v for v in lut if v <= dl)

    def score(term, doc):
        tf = toks[doc].count(term)
        if tf == 0:
            return 0.0
        df = sum(1 for v in toks.values() if term in v)
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf / (tf + 1.2 * (0.25 + 0.75 * qdl(len(toks[doc])) / avgdl))

    s1 = {d: sum(score(t_, d) for t_ in _RERANK_MAIN) for d in toks}
    cands = sorted((d for d in toks if s1[d] > 0), key=lambda d: (-s1[d], d))[:_RERANK_DOCS]
    blended = {d: s1[d] + _RERANK_WEIGHT * sum(score(t_, d) for t_ in _RERANK_SECOND) for d in cands}
    want = sorted(cands, key=lambda d: (-blended[d], d))[:10]
    assert got["doc_id"].tolist() == want
    for d, s in zip(got["doc_id"], got["score"]):
        assert abs(s - blended[int(d)]) < 1e-4 + 1e-9


def test_term_vectors_match_reanalysis(ray_session):
    """index_term_vectors (term-dict sweep + block-skip position decode)
    must equal re-analyzing the stored text of the requested docs with the
    same chain — tf, position sets, and per-doc tf sum == doc_len."""
    import pyarrow.parquet as pq

    from apache___solr_ray.analyze import Analyzer
    from apache___solr_ray.pipelines.indexq import _TV_DOCS
    from apache___solr_ray.pipelines.indexq import QUERIES as IQ

    sf = "/root/testdata/sf0.001"
    got = IQ["index_term_vectors"](sf).to_pandas()
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    txt = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    an = Analyzer()
    for d in _TV_DOCS:
        toks = an.analyze(txt[d])
        want: dict[str, list[int]] = {}
        for i, tok in enumerate(toks):
            want.setdefault(tok, []).append(i)
        sub = got[got.doc_id == d]
        assert set(sub.term) == set(want)
        for _, row in sub.iterrows():
            assert row.tf == len(want[row.term])
            assert row.positions == ",".join(map(str, want[row.term]))
        assert sub.tf.sum() == len(toks)


def test_elevation_pins_excludes_and_keeps_organic_order(ray_session):
    """Elevated ids come first in elevate-file order (even a doc with no
    query match), excluded ids never appear, and the organic tail is
    sorted by score desc / doc_id asc (QueryElevationComponent semantics)."""
    from apache___solr_ray.pipelines.indexq import (
        _ELEV_EXCLUDE,
        _ELEV_IDS,
        QUERIES as IQ,
    )

    sf = "/root/testdata/sf0.001"
    got = IQ["index_elevated_topk"](sf).to_pandas()
    assert list(got.doc_id[: len(_ELEV_IDS)]) == _ELEV_IDS
    assert got.elevated[: len(_ELEV_IDS)].all()
    assert not got.elevated[len(_ELEV_IDS):].any()
    assert not set(_ELEV_EXCLUDE) & set(got.doc_id)
    tail = got[len(_ELEV_IDS):]
    pairs = list(zip((-tail.score).tolist(), tail.doc_id.tolist()))
    assert pairs == sorted(pairs)


def test_ltr_linear_rerank_parity_vs_brute(ray_session):
    """ltr_linear_rerank_topk must equal a from-scratch brute computation
    over the raw tokenized corpus: first-pass BM25 window, then
    0.6*originalScore + 1.5*score('hash join') - 0.01*doc_len."""
    import math
    import re

    import pyarrow.parquet as pq

    from apache___solr_ray.lucene import LENGTH_TABLE
    from apache___solr_ray.pipelines.indexq import (
        _LTR_FEATURE_Q,
        _LTR_FIRST,
        _LTR_W,
        _LTR_WINDOW,
        QUERIES as IQ,
    )

    sf = "/root/testdata/sf0.001"
    got = IQ["ltr_linear_rerank_topk"](sf).to_pandas()

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        int(d): re.findall(r"[a-z0-9]+", (x or "").lower())
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    lut = sorted({int(x) for x in LENGTH_TABLE})

    def qdl(dl):
        return max(v for v in lut if v <= dl)

    def score(term, doc):
        tf = toks[doc].count(term)
        if tf == 0:
            return 0.0
        df = sum(1 for v in toks.values() if term in v)
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf / (tf + 1.2 * (0.25 + 0.75 * qdl(len(toks[doc])) / avgdl))

    s1 = {d: sum(score(x, d) for x in _LTR_FIRST) for d in toks}
    cands = sorted((d for d in toks if s1[d] > 0), key=lambda d: (-s1[d], d))[:_LTR_WINDOW]
    w0, w1, w2 = _LTR_W
    m = {
        d: w0 * s1[d] + w1 * sum(score(x, d) for x in _LTR_FEATURE_Q) + w2 * len(toks[d])
        for d in cands
    }
    want = sorted(cands, key=lambda d: (-m[d], d))[:10]
    assert got["doc_id"].tolist() == want
    for d, s in zip(got["doc_id"], got["score"]):
        assert abs(s - m[int(d)]) < 1e-4 + 1e-9


def test_sorted_index_early_termination(ray_session):
    """Index-time sort: sorted_topk equals a full scan of the sort column,
    and visits strictly fewer parts than the total (early termination)."""
    import pyarrow.parquet as pq

    from apache___solr_ray.pipelines.indexq import (
        _doc_id_map,
        ensure_doc_index_sorted,
    )
    from apache___solr_ray.query import IndexReader

    sf = "/root/testdata/sf0.001"
    index_dir = ensure_doc_index_sorted(sf)
    r = IndexReader(index_dir)
    idmap = _doc_id_map(index_dir)
    d, v, m = r.sorted_topk(10)
    assert m["parts_visited"] < m["parts_total"], m
    assert m["rows_scanned"] <= m["parts_visited"] * 10

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"])
    rows = sorted(
        zip(t["n_chars"].to_pylist(), t["doc_id"].to_pylist()),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    assert [idmap[int(x)] for x in d] == [doc for _, doc in rows]
    assert v.tolist() == [float(nc) for nc, _ in rows]


def test_sorted_cursor_pages_equal_topk_prefix(ray_session):
    """searchAfter pages over the sorted index must equal consecutive
    slices of one big sorted_topk, and later pages must still early-out
    (parts_visited < parts_total)."""
    from apache___solr_ray.pipelines.indexq import ensure_doc_index_sorted
    from apache___solr_ray.query import IndexReader

    sf = "/root/testdata/sf0.001"
    r = IndexReader(ensure_doc_index_sorted(sf))
    d_all, v_all, _ = r.sorted_topk(21)
    got_d, got_v, cursor = [], [], None
    for pg in range(3):
        d, v, m = r.sorted_topk(7, after=cursor)
        if pg == 0:  # deep cursors may legitimately need more parts to fill
            assert m["parts_visited"] < m["parts_total"]
        assert m["rows_scanned"] <= 7 * m["parts_visited"]
        got_d.extend(d.tolist())
        got_v.extend(v.tolist())
        cursor = (float(v[-1]), int(d[-1]))
    assert got_d == d_all.tolist()
    assert got_v == v_all.tolist()


def test_ltr_trees_model_traversal_vectorized_vs_scalar(ray_session):
    """MultipleAdditiveTreesModel's vectorized mask traversal must equal a
    scalar per-row walk of the same trees, and the catalog entry must rank
    by the ensemble sum."""
    import numpy as np

    from apache___solr_ray.ltr import MultipleAdditiveTreesModel
    from apache___solr_ray.pipelines.indexq import _LTR_TREES

    rng = np.random.default_rng(7)
    cols = {
        "originalScore": rng.uniform(0, 20, 500),
        "solrFeature": rng.uniform(0, 3, 500),
        "fieldValue": rng.integers(1, 120, 500).astype(np.float64),
    }
    # thresholds sit exactly on some values too: force boundary hits
    cols["originalScore"][:5] = 8.0
    cols["fieldValue"][:5] = 60.0

    def walk(node, i):
        while "value" not in node:
            f = cols[node["feature"]][i]
            node = node["left"] if f <= node["threshold"] else node["right"]
        return node["value"]

    class _Fake:
        def __init__(self, name):
            self.name = name

        def extract(self, reader, ids, fp):
            return cols[self.name]

    model = MultipleAdditiveTreesModel(
        features=[_Fake("originalScore"), _Fake("solrFeature"), _Fake("fieldValue")],
        trees=_LTR_TREES,
    )
    got = model.rescore(None, np.arange(500), np.zeros(500))
    want = np.array(
        [sum(walk(t, i) for t in _LTR_TREES) for i in range(500)]
    )
    assert np.array_equal(got, want)


def test_ltr_trees_entry_matches_linear_window(ray_session):
    """The trees entry reranks the SAME first-pass window as the linear
    entry (both use _LTR_FIRST / _LTR_WINDOW), so its top-10 doc set must
    be a subset of that window and scores must be ensemble sums."""
    from apache___solr_ray.pipelines.indexq import QUERIES as IQ

    sf = "/root/testdata/sf0.001"
    got = IQ["ltr_trees_rerank_topk"](sf).to_pandas()
    assert len(got) == 10
    assert got["rank"].tolist() == list(range(1, 11))
    # ensemble leaves are sums of at most 3 leaf values from the tree set
    leaves1 = {-0.5, 1.0, 2.0}
    leaves2 = {0.8, -0.3}
    leaves3 = {0.2, 0.05, 1.2}
    valid = {round(a + b + c, 4) for a in leaves1 for b in leaves2 for c in leaves3}
    assert set(round(float(s), 4) for s in got["score"]) <= valid
    # descending by score, ties by doc_id
    pairs = list(zip(got["score"].tolist(), got["doc_id"].tolist()))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_facet_pivot_tree_consistency(ray_session):
    """facet.pivot invariants: level-1 counts equal the sum of ALL their
    level-2 children pre-limit (i.e. equal the table's per-status counts),
    every level-3 row's parent survived the level-2 limit, per-parent
    child counts respect the limits, and counts are sorted desc per
    parent."""
    import pyarrow.parquet as pq

    from apache___solr_ray.pipelines.relational import QUERIES as RQ

    sf = "/root/testdata/sf0.001"
    got = RQ["facet_pivot_status_priority_year"](sf).to_pandas()
    orders = pq.read_table(
        f"{sf}/orders.parquet", columns=["o_orderstatus"]
    ).to_pandas()

    l1 = got[got["level"] == 1]
    truth = orders.groupby("o_orderstatus").size()
    assert dict(zip(l1["o_orderstatus"], l1["n"])) == truth.to_dict()

    l2 = got[got["level"] == 2]
    l3 = got[got["level"] == 3]
    for s, grp in l2.groupby("o_orderstatus"):
        assert len(grp) <= 3
        ns = grp["n"].tolist()
        assert ns == sorted(ns, reverse=True)
    surviving = set(zip(l2["o_orderstatus"], l2["o_orderpriority"]))
    for (s, p), grp in l3.groupby(["o_orderstatus", "o_orderpriority"]):
        assert (s, p) in surviving
        assert len(grp) <= 2
        assert grp["n"].tolist() == sorted(grp["n"].tolist(), reverse=True)


def test_backup_restore_roundtrip_and_incremental(built, tmp_path):
    """SnapShooter/IncrementalShardBackup analog: restore preserves the
    index fingerprint AND every queryable term; a second backup of the
    unchanged index writes ZERO new pool bodies; corruption is caught."""
    import pytest as _pytest

    from apache___solr_ray import backup as bk
    from apache___solr_ray.manifest import index_fingerprint
    from apache___solr_ray.pipelines.indexq import _term_df_table

    idx, _cfg, _man = built
    bdir = str(tmp_path / "backups")

    m1 = bk.create_backup(idx, bdir, "b1")
    assert m1["new_pool_files"] == len(m1["files"])  # first backup: all new

    # incremental: unchanged index -> zero new bodies, same file table
    m2 = bk.create_backup(idx, bdir, "b2")
    assert m2["new_pool_files"] == 0
    assert m2["files"] == m1["files"]
    assert bk.list_backups(bdir) == ["b1", "b2"]

    dest = str(tmp_path / "restored")
    fp = bk.restore_backup(bdir, "b1", dest)
    assert fp == index_fingerprint(idx) == m1["index_fingerprint"]
    got = _term_df_table(dest)
    want = _term_df_table(idx)
    assert got.equals(want)

    # restore refuses to clobber
    with _pytest.raises(bk.BackupError):
        bk.restore_backup(bdir, "b1", dest)

    # tamper with a pool body -> verify and restore both fail
    import os

    sha = next(iter(m1["files"].values()))["sha1"]
    body = os.path.join(bdir, "pool", sha)
    with open(body, "r+b") as f:
        f.seek(0)
        f.write(b"\xff")
    with _pytest.raises(bk.BackupError):
        bk.verify_backup(bdir, "b1")
    with _pytest.raises(bk.BackupError):
        bk.restore_backup(bdir, "b1", str(tmp_path / "restored2"))


def test_json_query_dsl_algebra(built):
    """JSON Query DSL over the small fixture: bool algebra must equal
    hand-computed set operations on match_docs results; nested bools,
    phrase leaves, pure-should union, and error paths."""
    import numpy as np
    import pytest as _pytest

    from apache___solr_ray.jsonquery import JsonQueryError, json_query_docs
    from apache___solr_ray.query import IndexReader

    idx, _cfg, _man = built
    r = IndexReader(idx)

    def s(q, mode="or"):
        return np.sort(r.match_docs(q, mode=mode))

    # must AND + must_not
    got = json_query_docs(
        r,
        {"bool": {"must": [{"lucene": {"query": "merge join", "q.op": "AND"}}],
                  "must_not": [{"field": {"f": "text", "query": "slow"}}]}},
    )
    want = np.setdiff1d(s("merge join", "and"), s("slow"), assume_unique=True)
    assert np.array_equal(got, want)

    # bare string == lucene OR
    assert np.array_equal(json_query_docs(r, "merge join"), s("merge join"))

    # nested bool inside must_not
    got = json_query_docs(
        r,
        {"bool": {"must": ["merge"],
                  "must_not": [{"bool": {"should": ["slow", "fast"]}}]}},
    )
    want = np.setdiff1d(
        s("merge"), np.union1d(s("slow"), s("fast")), assume_unique=True
    )
    assert np.array_equal(got, want)

    # pure should union (no mm) and mm=2
    got = json_query_docs(r, {"bool": {"should": ["merge", "fast"]}})
    assert np.array_equal(got, np.union1d(s("merge"), s("fast")))
    got = json_query_docs(
        r, {"bool": {"should": ["merge", "fast", "slow"],
                     "minimum_should_match": 2}}
    )
    m1, m2, m3 = s("merge"), s("fast"), s("slow")
    base = np.union1d(np.union1d(m1, m2), m3)
    hits = (
        np.isin(base, m1).astype(int)
        + np.isin(base, m2).astype(int)
        + np.isin(base, m3).astype(int)
    )
    assert np.array_equal(got, base[hits >= 2])

    # phrase leaf
    got = json_query_docs(r, {"phrase": {"query": "merge join"}})
    assert np.array_equal(got, np.sort(r.match_docs_phrase("merge join")))

    # unknown parser / malformed node raise
    with _pytest.raises(JsonQueryError):
        json_query_docs(r, {"nope": {}})
    with _pytest.raises(JsonQueryError):
        json_query_docs(r, {"bool": {}, "extra": {}})


def test_termdf_dataset_returns_global_df(built):
    """The termdf sidecar stores one row per (term, part) with PARTIAL df
    (regression: consumers that read it raw double-count at any scale
    with >1 doc part). termdf_dataset must return one row per term whose
    df equals the segment-summed global term dictionary."""
    from apache___solr_ray.pipelines.indexq import _term_df_table, termdf_dataset

    idx, _cfg, _man = built
    got = termdf_dataset(idx).to_pandas().sort_values("term").reset_index(drop=True)
    assert got["term"].is_unique
    want = _term_df_table(idx).to_pandas()
    merged = got.merge(want[["term", "df"]], on="term", suffixes=("", "_want"))
    assert len(merged) == len(want)
    assert (merged["df"] == merged["df_want"]).all()


def test_time_allowed_partial_results(built):
    """timeAllowed semantics: no budget -> full result identical to the
    scatter-gather merge with partial=False; zero budget -> partial=True
    with >= 1 shard merged and every returned doc a real match."""
    import numpy as np

    from apache___solr_ray.query import scatter_gather_topk, timed_partial_topk

    idx, _cfg, _man = built
    full_d, full_s = scatter_gather_topk(idx, "merge join", 10, n_shards=4)

    d, s, partial, n = timed_partial_topk(idx, "merge join", 10, None, n_shards=4)
    assert not partial and n >= 1
    assert np.array_equal(d, full_d) and np.array_equal(s, full_s)

    d2, s2, partial2, n2 = timed_partial_topk(idx, "merge join", 10, 0.0, n_shards=4)
    assert n2 >= 1  # at least one shard is always awaited
    assert len(d2) == len(s2)
    # a partial page may even be empty (the surviving shard had no
    # matches) — that is Solr's partialResults contract; what must hold:
    # every returned doc also appears in the full merge's candidate set
    full_all, _ = scatter_gather_topk(idx, "merge join", 10_000, n_shards=4)
    assert set(map(int, d2)) <= set(map(int, full_all))
    if not partial2:  # every shard beat the (zero) budget: full equality
        assert np.array_equal(d2, full_d)


def test_mm_spec_calculator_reference_vectors(ray_session):
    """calculate_min_should_match must reproduce the reference's own
    SolrPluginUtilsTest table (integers, negatives, percentages,
    conditional chains)."""
    import pytest as _pytest

    from apache___solr_ray.query import calculate_min_should_match as f

    cases = [
        (3, "3", 3), (4, "-2", 2), (4, "50%", 2), (5, "50%", 2),
        (4, "-25%", 3), (3, "2<-25%", 3), (4, "2<-25%", 3),
        (5, "2<-25%", 4), (1, "2<-25%", 1),
        (10, "3<-1 5<-2 7<50%", 5), (4, "3<-1 5<-2 7<50%", 3),
        (6, "3<-1 5<-2 7<50%", 4), (2, "3<-1 5<-2 7<50%", 2),
        (8, "3<-1 5<-2 7<50%", 4),
        (5, "100%", 5), (5, "-100%", 0), (3, "0", 0), (3, "5", 3),
        (3, " 3 < -25% ", 3),  # the spec language tolerates spaces around <
    ]
    for n, spec, want in cases:
        assert f(n, spec) == want, (n, spec)
    with _pytest.raises(ValueError):
        f(3, "<2")


def test_shards_tolerant_skips_failed_shard(built, tmp_path):
    """shards.tolerant=true (ShardParams.SHARDS_TOLERANT): REAL failure
    injection — clone the index via backup/restore, corrupt one docs
    part so exactly the shards covering it fail, then the tolerant merge
    must return the healthy shards' results flagged partial, while the
    intolerant path raises."""
    import numpy as np
    import pytest as _pytest

    from apache___solr_ray import backup as bk
    from apache___solr_ray.query import IndexReader, timed_partial_topk

    idx, _cfg, _man = built
    bdir = str(tmp_path / "b")
    bk.create_backup(idx, bdir, "t")
    clone = str(tmp_path / "clone")
    bk.restore_backup(bdir, "t", clone)

    r = IndexReader(clone)
    n_parts = r.n_doc_parts
    r.close()
    assert n_parts >= 2
    # full healthy baseline first
    d0, s0, p0, n0 = timed_partial_topk(clone, "merge join", 10, None, n_shards=2)
    assert not p0 and n0 == 2

    # corrupt every segment's postings so shard tasks raise on decode
    import glob
    import os

    victims = glob.glob(os.path.join(clone, "segments", "*", "*"))
    assert victims
    for v in victims:
        with open(v, "wb") as f:
            f.write(b"corrupt")

    with _pytest.raises(Exception):
        timed_partial_topk(clone, "merge join", 10, None, n_shards=2)

    d1, s1, partial, n1 = timed_partial_topk(
        clone, "merge join", 10, None, n_shards=2, tolerant=True
    )
    # every shard failed: tolerant returns the empty partial page instead
    # of propagating (Solr returns partialResults=true with what's left)
    assert partial and n1 == 0 and len(d1) == 0 and len(s1) == 0
    del d0, s0  # baseline only proves the clone was healthy pre-corruption
