"""BM25 top-k query serving over the built index.

Rebuilds the reference query path (SURVEY §3.2: ``SearchHandler`` →
``SolrIndexSearcher`` with ``BM25Similarity`` + Lucene's block-max WAND
pruning; distributed merge semantics of ``QueryComponent.mergeIds``):

- global collection stats (docCount, sumTotalTermFreq, exact global df) come
  from the build — ExactStatsCache semantics (reference
  ``solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java``),
  so ranking is identical to a single index regardless of partitioning;
- per-term scorers are Lucene-exact (lucene.BM25Scorer); multi-term scores
  sum per Lucene's DisjunctionSumScorer (float64 accumulate → float32);
- top-k ties break by ascending doc_id (Lucene single-index collector
  order, the conformance rule fixed in SURVEY §7.4);
- evaluation is **block-max pruned**: per 128-doc block the skip header's
  (max_tf, min_norm) gives an upper score bound; doc-space regions whose
  summed bound cannot beat the running k-th score are skipped without
  decoding. Regions are visited in descending bound order so the threshold
  rises as fast as possible (the WAND idea, vectorized region-at-a-time
  rather than pointer-chased doc-at-a-time — the right shape for numpy).

``TopKQueryActor`` is the stateful stage: construct once per actor (opens
the index, caches term dicts / hot postings), score query batches in
``__call__`` — used via ``Dataset.map_batches(TopKQueryActor, concurrency=N,
...)``. ``scatter_gather_topk`` additionally doc-range-splits one query
across Ray tasks and k-way-merges with the reference tie-break — the
distributed scatter/gather analog.
"""

from __future__ import annotations

import os
from collections import Counter, OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from apache___solr_ray.analyze import Analyzer
from apache___solr_ray.lucene import BM25Scorer
from apache___solr_ray.manifest import read_json
from apache___solr_ray.segment import SegmentReader


class TermPostings:
    """All posting parts of one term (unsalted: 1 part; salted: ≤P parts,
    disjoint doc ranges ordered by doc partition)."""

    __slots__ = ("term", "views", "df", "ttf", "_bt", "_full")

    #: full-decode cache is only kept for heavy terms — the ones whose
    #: repeated decode dominates serving cost (head terms by Zipf are few)
    HEAVY_DF = 20_000

    def __init__(self, term, views, df, ttf):
        self.term = term
        self.views = views  # list[PostingsView], global doc order across list
        self.df = df
        self.ttf = ttf
        self._bt = None  # cached global block table (lasts, mtf, mnorm, view_of, local_bi)
        self._full = None  # cached decode_all for heavy terms

    def decode_all_cached(self):
        if self._full is not None:
            return self._full
        out = self.decode_all()
        if self.df >= self.HEAVY_DF:
            self._full = out
        return out

    def global_blocks(self):
        """Concatenated per-block skip data across views, with the mapping
        global block index -> (view index, local block index)."""
        if self._bt is None:
            lasts, mtf, mnorm, view_of, local_bi = [], [], [], [], []
            for vi, v in enumerate(self.views):
                h = v.headers
                lasts.append(h["last_doc"].astype(np.int64))
                mtf.append(h["max_tf"].astype(np.int64))
                mnorm.append(h["min_norm"].astype(np.int64))
                view_of.append(np.full(len(h), vi, dtype=np.int64))
                local_bi.append(np.arange(len(h), dtype=np.int64))
            self._bt = (
                np.concatenate(lasts),
                np.concatenate(mtf),
                np.concatenate(mnorm),
                np.concatenate(view_of),
                np.concatenate(local_bi),
            )
        return self._bt

    def decode_blocks_global(self, gbis: np.ndarray):
        """Batch-decode global block indices (sorted unique) across views."""
        _, _, _, view_of, local_bi = self.global_blocks()
        dl, tl, ml = [], [], []
        vsel = view_of[gbis]
        lsel = local_bi[gbis]
        for vi in np.unique(vsel):
            d, t, m = self.views[vi].decode_blocks(lsel[vsel == vi])
            dl.append(d)
            tl.append(t)
            ml.append(m)
        return np.concatenate(dl), np.concatenate(tl), np.concatenate(ml)

    def block_table(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Concatenated skip data: (block_start_doc, block_last_doc, max_tf,
        min_norm) across parts. Start of block b = previous last_doc + 1."""
        starts, lasts, mtf, mnorm = [], [], [], []
        for v in self.views:
            h = v.headers
            last = h["last_doc"].astype(np.int64)
            first = np.empty(len(h), dtype=np.int64)
            first[0] = 0 if not lasts else 0  # start bound: conservative 0 for first block of a part
            if len(h) > 1:
                first[1:] = last[:-1] + 1
            starts.append(first)
            lasts.append(last)
            mtf.append(h["max_tf"].astype(np.int64))
            mnorm.append(h["min_norm"].astype(np.int64))
        return (
            np.concatenate(starts),
            np.concatenate(lasts),
            np.concatenate(mtf),
            np.concatenate(mnorm),
        )

    def decode_range(self, lo: int, hi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode postings with lo <= doc_id <= hi, touching only needed blocks."""
        docs_out, tfs_out, norms_out = [], [], []
        for v in self.views:
            lasts = v.headers["last_doc"].astype(np.int64)
            if len(lasts) == 0 or lasts[-1] < lo:
                continue
            b0 = int(np.searchsorted(lasts, lo, side="left"))
            for bi in range(b0, len(lasts)):
                d, t, m = v.decode_block(bi)
                if d[0] > hi:
                    break
                sel = (d >= lo) & (d <= hi)
                if sel.any():
                    docs_out.append(d[sel])
                    tfs_out.append(t[sel])
                    norms_out.append(m[sel])
                if lasts[bi] >= hi:
                    break
        if not docs_out:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), np.zeros(0, dtype=np.uint8)
        return np.concatenate(docs_out), np.concatenate(tfs_out), np.concatenate(norms_out)

    def decode_all(self):
        parts = [v.decode_all() for v in self.views]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )

    def positions_for_docs(self, docs_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Positions of this term restricted to the given (sorted, unique)
        doc ids. Returns flat ``(doc_rep, pos)`` — one row per occurrence.
        Only blocks that can contain a candidate doc are decoded; the
        position stream is sliced per selected block (never for skipped
        doc ranges) — the phrase path's skip behavior."""
        out_docs: list[np.ndarray] = []
        out_pos: list[np.ndarray] = []
        for v in self.views:
            lasts = v.headers["last_doc"].astype(np.int64)
            if len(lasts) == 0:
                continue
            cand = docs_sorted[docs_sorted <= lasts[-1]]
            if len(cand) == 0:
                continue
            bis = np.unique(np.searchsorted(lasts, cand, side="left"))
            bis = bis[bis < len(lasts)]
            if len(bis) == 0:
                continue
            d, t, _ = v.decode_blocks(bis)
            sel = np.isin(d, docs_sorted, assume_unique=True)
            if not sel.any():
                continue
            pos_flat = v.decode_blocks_positions(bis, t)
            rep_sel = np.repeat(sel, t)
            out_docs.append(np.repeat(d[sel], t[sel]))
            out_pos.append(pos_flat[rep_sel])
        if not out_docs:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy()
        return np.concatenate(out_docs), np.concatenate(out_pos)


class IndexReader:
    """Open a committed index: stats + segment directory, lazy everything."""

    def __init__(
        self,
        index_dir: str,
        cache_docs_parts: int = 64,
        part_range: tuple[int, int] | None = None,
    ):
        self.dir = index_dir
        man = read_json(os.path.join(index_dir, "index_manifest.json"))
        if man is None:
            raise FileNotFoundError(f"no committed index at {index_dir}")
        self.manifest = man
        self.stats = man["stats"]
        self.doc_count = self.stats["doc_count"]
        self.sum_total_tf = self.stats["sum_total_tf"]
        #: per-field CollectionStatistics for multi-field schemas
        #: (ExactStatsCache is per-field in the reference too)
        self.field_stats: dict[str, dict] = self.stats.get("fields") or {}
        self.n_doc_parts = self.stats["n_doc_parts"]
        self.T = self.stats["term_partitions"]
        self._segments_by_tkey: dict[int, list[dict]] = {}
        for s in man["segments"]:
            s = dict(s)
            s.setdefault("name", f"seg-{s['tkey']:05d}-{s['salt']:05d}")
            if part_range is not None:
                # doc-range-sharded reader: skip segments whose covered doc
                # partitions don't overlap the shard (memory bound = shard's
                # segments only; manifests without ranges keep everything)
                p_lo = int(s.get("part_lo", 0))
                p_hi = int(s.get("part_hi", self.n_doc_parts))
                if p_hi <= part_range[0] or p_lo >= part_range[1]:
                    continue
            self._segments_by_tkey.setdefault(s["tkey"], []).append(s)
        for v in self._segments_by_tkey.values():
            v.sort(key=lambda s: s["salt"])
        self._readers: dict[str, SegmentReader] = {}
        self._term_cache: OrderedDict[str, TermPostings | None] = OrderedDict()
        self._docs_cache: OrderedDict[int, pa.Table] = OrderedDict()
        self._cache_docs_parts = cache_docs_parts
        from apache___solr_ray.deletes import load_tombstones

        self.tombstones = load_tombstones(index_dir)
        self.analyzer = Analyzer()  # same default chain as the build

    def _alive(self, doc_ids: np.ndarray) -> np.ndarray | None:
        """Bool mask of non-tombstoned docs, or None when nothing is
        deleted (Lucene liveDocs)."""
        if len(self.tombstones) == 0:
            return None
        return ~np.isin(doc_ids, self.tombstones, assume_unique=False)

    # -- segment access -----------------------------------------------------

    def _reader(self, name: str) -> SegmentReader:
        r = self._readers.get(name)
        if r is None:
            r = SegmentReader(os.path.join(self.dir, "segments", name))
            self._readers[name] = r
        return r

    def term_postings(self, term: str) -> TermPostings | None:
        hit = self._term_cache.get(term)
        if term in self._term_cache:
            self._term_cache.move_to_end(term)
            return hit
        from apache___solr_ray.build import term_hash

        tkey = int(term_hash(np.array([term], dtype=object))[0] % np.uint64(self.T))
        views, df, ttf = [], 0, 0
        for seg in self._segments_by_tkey.get(tkey, ()):
            r = self._reader(seg["name"])
            v = r.postings(term)
            if v is not None:
                st = r.term_stats(term)
                views.append(v)
                df += st[0]
                ttf += st[1]
        # a term's views hold disjoint doc ranges (each posting row lands in
        # exactly one segment); order them by doc range for global doc order
        views.sort(key=lambda v: int(v.headers["last_doc"][0]) if len(v.headers) else 0)
        out = TermPostings(term, views, df, ttf) if views else None
        self._term_cache[term] = out
        if len(self._term_cache) > 4096:
            self._term_cache.popitem(last=False)
        return out

    # -- scoring ------------------------------------------------------------

    def _field_collection_stats(self, field: str | None) -> tuple[int, int]:
        """(docCount, sumTotalTermFreq) for BM25's avgdl — per-field when the
        schema has that field (Lucene CollectionStatistics is per-field),
        else the whole-collection stats of the implicit single field."""
        if field and field in self.field_stats:
            fs = self.field_stats[field]
            return int(fs["doc_count"]), int(fs["sum_total_tf"])
        return self.doc_count, self.sum_total_tf

    def _scorers(
        self,
        query: str,
        df_override: dict[str, int] | None = None,
        field: str | None = None,
    ) -> list[tuple[TermPostings, BM25Scorer]]:
        counts = Counter(self.analyzer.analyze(query))
        dc, stf = self._field_collection_stats(field)
        prefix = f"{field}:" if field else ""
        out = []
        for tok, n in counts.items():
            term = prefix + tok
            tp = self.term_postings(term)
            if tp is not None:
                # n duplicate query terms == n identical clauses == boost n;
                # df_override carries GLOBAL df for doc-range-sharded readers
                # (ExactStatsCache semantics — a shard's local df would give
                # the reference's LocalStatsCache ranking divergence)
                df = df_override.get(term, tp.df) if df_override else tp.df
                out.append((tp, BM25Scorer(df, dc, stf, boost=float(n))))
        return out

    def term_stats_map(self, query: str) -> dict[str, int]:
        """Global (term -> df) for a query — the ExactStatsCache round-trip
        payload a coordinator broadcasts to shards."""
        return {
            term: tp.df
            for term in Counter(self.analyzer.analyze(query))
            if (tp := self.term_postings(term)) is not None
        }

    def topk_exhaustive(
        self, query: str, k: int = 10, field: str | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode-everything scorer: the correctness baseline."""
        scorers = self._scorers(query, field=field)
        if not scorers:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        docs_list, score_list = [], []
        for tp, sc in scorers:
            d, t, m = tp.decode_all()
            alive = self._alive(d)
            if alive is not None:
                d, t, m = d[alive], t[alive], m[alive]
            docs_list.append(d)
            score_list.append(sc.score(t, m))
        return _topk_from_candidates(docs_list, score_list, k)

    def match_docs(self, query: str, mode: str = "or") -> np.ndarray:
        """Exact matching doc-id set for a boolean query — the DocSet analog
        (reference DocSet.java / the `lucene` parser's default-OR vs
        required-AND clause semantics). No scoring, just set algebra over
        decoded postings: union for "or", intersection for "and"."""
        counts = Counter(self.analyzer.analyze(query))
        sets = []
        for term in counts:
            tp = self.term_postings(term)
            sets.append(tp.decode_all()[0] if tp is not None else np.zeros(0, np.int64))
        if not sets:
            return np.zeros(0, np.int64)
        if mode == "or":
            out = np.unique(np.concatenate(sets))
        else:
            out = sets[0]
            for s in sets[1:]:
                out = out[np.isin(out, s, assume_unique=True)]
        alive = self._alive(out)
        return out if alive is None else out[alive]

    def phrase_freqs(self, phrase: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Exact-phrase evaluation (Lucene PhraseQuery, slop=0) from the
        position streams. Returns ``(doc_ids, phrase_freq, norms)`` for every
        live doc where the analyzed tokens of ``phrase`` occur consecutively;
        phrase_freq counts the start positions (the PhraseQuery tf).

        Evaluation: candidate docs = intersection of all terms' postings
        (rarest term first); positions decoded ONLY for blocks holding
        candidates; adjacency via one sorted-key intersection per term
        (key = candidate_rank << 32 | position - clause_offset).

        Reference semantics: Lucene ExactPhraseMatcher; Solr surface
        ``solr/core/src/test/org/apache/solr/search/TestComplexPhraseQParserPlugin.java``.
        """
        toks = self.analyzer.analyze(phrase)
        z = np.zeros(0, dtype=np.int64)
        if not toks:
            return z, z.copy(), np.zeros(0, dtype=np.uint8)
        tps = [self.term_postings(t) for t in toks]
        if any(tp is None for tp in tps):
            return z, z.copy(), np.zeros(0, dtype=np.uint8)
        if len(toks) == 1:
            d, t, m = tps[0].decode_all()
            alive = self._alive(d)
            if alive is not None:
                d, t, m = d[alive], t[alive], m[alive]
            return d, t, m
        # candidates: intersect doc sets, rarest first so the working set
        # shrinks fastest (Lucene leads with the lowest-cost scorer)
        order = np.argsort([tp.df for tp in tps], kind="stable")
        cand = d0 = m0 = None
        for j, i in enumerate(order):
            d, _t, m = tps[i].decode_all()
            if j == 0:
                d0, m0 = d, m
            cand = d if cand is None else cand[np.isin(cand, d, assume_unique=True)]
            if len(cand) == 0:
                return z, z.copy(), np.zeros(0, dtype=np.uint8)
        alive = self._alive(cand)
        if alive is not None:
            cand = cand[alive]
        if len(cand) == 0:
            return z, z.copy(), np.zeros(0, dtype=np.uint8)
        # adjacency: for clause i at offset i, key = rank(doc) << 32 | (pos - i);
        # a phrase start is a key present for every clause
        keys = None
        for i, tp in enumerate(tps):
            doc_rep, pos = tp.positions_for_docs(cand)
            p = pos - i
            ok = p >= 0
            rank = np.searchsorted(cand, doc_rep[ok])
            k = (rank << np.int64(32)) | p[ok]
            k.sort()
            keys = k if keys is None else keys[np.isin(keys, k, assume_unique=True)]
            if len(keys) == 0:
                return z, z.copy(), np.zeros(0, dtype=np.uint8)
        ranks = (keys >> np.int64(32)).astype(np.int64)
        freq = np.bincount(ranks, minlength=len(cand)).astype(np.int64)
        hit = freq > 0
        docs = cand[hit]
        # norms for scoring come from any clause's postings (same doc norm)
        norms = m0[np.searchsorted(d0, docs)]
        return docs, freq[hit], norms

    def match_docs_phrase(self, phrase: str) -> np.ndarray:
        """DocSet of the exact phrase — the `\"...\"` clause analog."""
        return self.phrase_freqs(phrase)[0]

    def span_near_docs(self, phrase: str, slop: int = 0) -> np.ndarray:
        """Ordered span-near match (reference surround parser /
        SpanNearQuery(inOrder=true), NearSpansOrdered semantics): docs with
        positions p_0 < p_1 < ... < p_{n-1} for the analyzed clause terms
        IN ORDER whose TOTAL gap budget sum(p_i - p_{i-1} - 1) =
        p_{n-1} - p_0 - (n-1) is ≤ slop (slop=0 == exact phrase
        adjacency). The slop is a whole-span budget, not per-gap —
        matching Lucene's SloppyMath accumulation for ordered spans.

        Vectorized greedy chain over the position streams: for every
        clause-0 start position, repeatedly take the SMALLEST same-doc
        next-clause position strictly greater (one searchsorted per
        clause on the sorted (doc_rank, pos) key space) — greedy-smallest
        minimizes the final span end, so the budget check on the chain's
        end is exact. Positions are decoded only for candidate-
        intersection blocks."""
        toks = self.analyzer.analyze(phrase)
        z = np.zeros(0, dtype=np.int64)
        if not toks:
            return z
        tps = [self.term_postings(t) for t in toks]
        if any(tp is None for tp in tps):
            return z
        if len(toks) == 1:
            d = tps[0].decode_all()[0]
            alive = self._alive(d)
            return d if alive is None else d[alive]
        order = np.argsort([tp.df for tp in tps], kind="stable")
        cand = None
        for i in order:
            d = tps[i].decode_all()[0]
            cand = d if cand is None else cand[np.isin(cand, d, assume_unique=True)]
            if len(cand) == 0:
                return z
        alive = self._alive(cand)
        if alive is not None:
            cand = cand[alive]
        if len(cand) == 0:
            return z
        per_clause = [tp.positions_for_docs(cand) for tp in tps]
        max_pos = max((int(p.max()) for _, p in per_clause if len(p)), default=0)
        M = np.int64(max_pos + 2)
        keyspaces = []
        for doc_rep, pos in per_clause:
            rank = np.searchsorted(cand, doc_rep)
            keys = rank.astype(np.int64) * M + pos.astype(np.int64)
            keys.sort()
            keyspaces.append(keys)
        return self._ordered_chain_docs(cand, keyspaces, M, slop)

    @staticmethod
    def _ordered_chain_docs(
        cand: np.ndarray, keyspaces: list[np.ndarray], M: np.int64, slop: int
    ) -> np.ndarray:
        """Docs with an in-order chain through the clause keyspaces whose
        whole-span gap budget is ≤ slop. Greedy chain: start = clause-0
        keys; each step jumps to the smallest strictly-greater same-doc key
        of the next clause (greedy-smallest minimizes the final span end,
        so the budget check on the chain's end is exact)."""
        z = np.zeros(0, dtype=np.int64)
        start = keyspaces[0]
        cur = start
        for keys in keyspaces[1:]:
            if len(keys) == 0:
                return z
            idx = np.searchsorted(keys, cur, side="right")
            ok = idx < len(keys)
            nxt = keys[np.minimum(idx, len(keys) - 1)]
            # must stay within the same doc (same rank block)
            ok &= (nxt // M) == (cur // M)
            start, cur = start[ok], nxt[ok]
            if len(cur) == 0:
                return z
        # total budget: span width minus (n-1) interior steps ≤ slop
        ok = (cur - start) <= np.int64(slop + len(keyspaces) - 1)
        if not ok.any():
            return z
        return cand[np.unique(start[ok] // M)]

    def complex_phrase_docs(self, phrase: str, slop: int = 0) -> np.ndarray:
        """ComplexPhraseQParser analog (reference
        solr/core/src/java/org/apache/solr/search/ComplexPhraseQParserPlugin.java:
        wildcards INSIDE a phrase — each clause rewrites to the terms it
        matches, then the whole phrase evaluates as an ordered span).
        A clause containing ``*``/``?`` expands through the sorted term
        dictionaries; its position stream is the UNION of the matched
        terms' positions. Ordered with a whole-span slop budget, matching
        span_near_docs."""
        z = np.zeros(0, dtype=np.int64)
        clause_tps: list[list] = []
        for raw in phrase.split():
            if "*" in raw or "?" in raw:
                terms = self.expand_wildcard(raw.lower())
            else:
                terms = self.analyzer.analyze(raw)
            tps = [tp for t in terms if (tp := self.term_postings(t)) is not None]
            if not tps:
                return z
            clause_tps.append(tps)
        if not clause_tps:
            return z
        cand = None
        for tps in clause_tps:
            docs = np.unique(np.concatenate([tp.decode_all()[0] for tp in tps]))
            cand = docs if cand is None else cand[np.isin(cand, docs, assume_unique=True)]
            if len(cand) == 0:
                return z
        alive = self._alive(cand)
        if alive is not None:
            cand = cand[alive]
        if len(cand) == 0:
            return z
        per_clause = []
        max_pos = 0
        for tps in clause_tps:
            reps, poss = [], []
            for tp in tps:
                doc_rep, pos = tp.positions_for_docs(cand)
                reps.append(doc_rep)
                poss.append(pos)
            doc_rep = np.concatenate(reps)
            pos = np.concatenate(poss)
            if len(pos):
                max_pos = max(max_pos, int(pos.max()))
            per_clause.append((doc_rep, pos))
        M = np.int64(max_pos + 2)
        keyspaces = []
        for doc_rep, pos in per_clause:
            rank = np.searchsorted(cand, doc_rep)
            keys = rank.astype(np.int64) * M + pos.astype(np.int64)
            keys.sort()
            keyspaces.append(keys)
        return self._ordered_chain_docs(cand, keyspaces, M, slop)

    def payload_scores(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """PayloadScoreQParser analog (reference
        solr/core/src/java/org/apache/solr/search/PayloadScoreQParserPlugin.java:
        score = func over the payloads at the term's matching positions,
        func ∈ {min,max,sum,first}). The corpus carries no payload channel,
        so the per-position payload IS the position (the codec-v2 stream a
        DelimitedPayload filter would fill) — integer sums/mins, exactly
        mirrorable in SQL. Returns (doc_ids, payload_sum, payload_min) for
        live docs containing the term."""
        z = np.zeros(0, dtype=np.int64)
        tp = self.term_postings(term)
        if tp is None:
            return z, z.copy(), z.copy()
        docs = tp.decode_all()[0]
        alive = self._alive(docs)
        if alive is not None:
            docs = docs[alive]
        if len(docs) == 0:
            return z, z.copy(), z.copy()
        doc_rep, pos = tp.positions_for_docs(docs)
        rank = np.searchsorted(docs, doc_rep)
        sums = np.bincount(rank, weights=pos.astype(np.float64), minlength=len(docs)).astype(
            np.int64
        )
        order = np.lexsort((pos, rank))
        r_sorted, p_sorted = rank[order], pos[order]
        starts = np.flatnonzero(np.diff(r_sorted, prepend=-1))
        mins = np.full(len(docs), -1, dtype=np.int64)
        mins[r_sorted[starts]] = p_sorted[starts]
        return docs, sums, mins

    def topk_phrase(self, phrase: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """BM25-scored phrase top-k: tf = phrase frequency, weight uses the
        SUM of the clause terms' idfs (BM25Similarity.idfExplain over
        multiple termStats — the Lucene PhraseWeight construction)."""
        docs, freq, norms = self.phrase_freqs(phrase)
        if len(docs) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        toks = self.analyzer.analyze(phrase)
        dfs = [tp.df for t in toks if (tp := self.term_postings(t)) is not None]
        sc = BM25Scorer(dfs, self.doc_count, self.sum_total_tf)
        scores = sc.score(freq, norms)
        return _topk_from_candidates([docs], [scores], k)

    def expand_prefix(self, prefix: str) -> list[str]:
        """Indexed terms with the prefix — PrefixQuery term expansion. Every
        tkey bucket can hold matches (tkey is a hash), but per segment the
        dict is sorted, so each segment is two binary searches + a slice
        (no per-term scan; Lucene seeks the TermsEnum identically)."""
        out: set[str] = set()
        for segs in self._segments_by_tkey.values():
            for seg in segs:
                out.update(self._reader(seg["name"]).terms_with_prefix(prefix))
        return sorted(out)

    def expand_wildcard(self, pattern: str) -> list[str]:
        """WildcardQuery expansion: ``*``/``?`` translated to SQL-LIKE and
        matched by the vectorized C kernel per segment dict. Lucene-style
        backslash escapes are honored: ``\\*`` / ``\\?`` match the literal
        character (WildcardQuery.toAutomaton's escape handling), so the
        pattern is parsed char-by-char before mapping to LIKE."""
        out_chars: list[str] = []
        i = 0
        while i < len(pattern):
            c = pattern[i]
            if c == "\\" and i + 1 < len(pattern):
                nxt = pattern[i + 1]
                # escaped char is literal: protect LIKE metachars
                out_chars.append("\\" + nxt if nxt in "%_\\" else nxt)
                i += 2
                continue
            if c == "*":
                out_chars.append("%")
            elif c == "?":
                out_chars.append("_")
            elif c in "%_\\":
                out_chars.append("\\" + c)
            else:
                out_chars.append(c)
            i += 1
        like = "".join(out_chars)
        out: set[str] = set()
        for segs in self._segments_by_tkey.values():
            for seg in segs:
                out.update(self._reader(seg["name"]).terms_matching_like(like))
        return sorted(out)

    def expand_fuzzy1(self, term: str, dist_fn) -> list[str]:
        """FuzzyQuery (edit distance ≤ 1) expansion: vectorized length
        prefilter per segment dict, distance computed only on survivors."""
        out: set[str] = set()
        for segs in self._segments_by_tkey.values():
            for seg in segs:
                out.update(self._reader(seg["name"]).terms_within_edit1(term, dist_fn))
        return sorted(out)

    def facet_by(self, doc_ids: np.ndarray, column: str) -> dict[str, int]:
        """Facet counts of a doc set over a stored doc-sidecar column —
        search + facet (FacetComponent over a DocSet)."""
        from collections import Counter as _C

        agg: _C = _C()
        parts = doc_ids >> np.int64(32)
        rows = doc_ids & np.int64(0xFFFFFFFF)
        for part in np.unique(parts):
            t = pq.read_table(
                os.path.join(self.dir, "docs", f"part-{int(part):06d}.parquet"),
                columns=[column],
            )
            vals = t.column(column).take(pa.array(rows[parts == part])).to_pylist()
            agg.update(vals)
        return dict(agg)

    def doc_filter_mask(self, column: str, value: str):
        """Vectorized doc-id -> bool filter from a doc-sidecar column (the
        `fq` filter-query analog; at scale this is a per-part bitset cached
        like the reference's filterCache)."""
        masks: dict[int, np.ndarray] = {}

        def allowed(doc_ids: np.ndarray) -> np.ndarray:
            parts = doc_ids >> np.int64(32)
            rows = doc_ids & np.int64(0xFFFFFFFF)
            out = np.zeros(len(doc_ids), dtype=bool)
            for part in np.unique(parts):
                p = int(part)
                if p not in masks:
                    import pyarrow.compute as _pc

                    t = pq.read_table(
                        os.path.join(self.dir, "docs", f"part-{p:06d}.parquet"),
                        columns=[column],
                    )
                    masks[p] = np.asarray(
                        _pc.equal(t.column(column), value).to_numpy(zero_copy_only=False)
                    )
                sel = parts == part
                out[sel] = masks[p][rows[sel]]
            return out

        return allowed

    def doc_range_mask(self, column: str, lo=None, hi=None):
        """Numeric/date range filter over a doc-sidecar (docValues) column —
        the `frange` / point-field range-query analog (reference
        FunctionRangeQParserPlugin.java, IntPointField.java). Bounds are
        inclusive; None = unbounded. Per-part bool masks are computed once
        with Arrow kernels and cached (the filterCache shape)."""
        masks: dict[int, np.ndarray] = {}

        def allowed(doc_ids: np.ndarray) -> np.ndarray:
            import pyarrow.compute as _pc

            parts = doc_ids >> np.int64(32)
            rows = doc_ids & np.int64(0xFFFFFFFF)
            out = np.zeros(len(doc_ids), dtype=bool)
            for part in np.unique(parts):
                p = int(part)
                if p not in masks:
                    t = pq.read_table(
                        os.path.join(self.dir, "docs", f"part-{p:06d}.parquet"),
                        columns=[column],
                    )
                    col = t.column(column)
                    m = None
                    if lo is not None:
                        m = _pc.greater_equal(col, lo)
                    if hi is not None:
                        mh = _pc.less_equal(col, hi)
                        m = mh if m is None else _pc.and_(m, mh)
                    if m is None:
                        masks[p] = np.ones(len(col), dtype=bool)
                    else:
                        masks[p] = np.asarray(
                            _pc.fill_null(m, False).to_numpy(zero_copy_only=False)
                        )
                sel = parts == part
                out[sel] = masks[p][rows[sel]]
            return out

        return allowed

    def topk_filtered(
        self, query: str, k: int, allowed
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k over docs passing a filter (fq analog): full scoring of the
        disjunction, filter applied BEFORE rank selection — exact."""
        scorers = self._scorers(query)
        if not scorers:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        docs_list, score_list = [], []
        for tp, sc in scorers:
            d, t, m = tp.decode_all()
            keep = allowed(d)
            alive = self._alive(d)
            if alive is not None:
                keep = keep & alive
            docs_list.append(d[keep])
            score_list.append(sc.score(t[keep], m[keep]))
        return _topk_from_candidates(docs_list, score_list, k)

    def topk_and(self, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Conjunctive (+term +term) top-k: BM25 disjunctive-sum scores
        restricted to docs containing EVERY query term."""
        must = self.match_docs(query, mode="and")
        return self.topk_filtered(
            query, k, lambda d: np.isin(d, must, assume_unique=False)
        )

    def grouped_topk(
        self, query: str, group_col: str, k_per_group: int = 3
    ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """Result grouping (Grouping.java / group.field analog): top-k docs
        per value of a doc-sidecar column. One full scoring pass; the
        group partition happens on the scored candidates."""
        scorers = self._scorers(query)
        if not scorers:
            return {}
        docs_list, score_list = [], []
        for tp, sc in scorers:
            d, t, m = tp.decode_all()
            alive = self._alive(d)
            if alive is not None:
                d, t, m = d[alive], t[alive], m[alive]
            docs_list.append(d)
            score_list.append(sc.score(t, m))
        d_all, s_all = _topk_from_candidates(docs_list, score_list, 10**9)
        groups: dict[str, list[int]] = {}
        parts = d_all >> np.int64(32)
        rows = d_all & np.int64(0xFFFFFFFF)
        vals = np.empty(len(d_all), dtype=object)
        for part in np.unique(parts):
            t = pq.read_table(
                os.path.join(self.dir, "docs", f"part-{int(part):06d}.parquet"),
                columns=[group_col],
            )
            sel = parts == part
            vals[sel] = np.asarray(
                t.column(group_col).take(pa.array(rows[sel])).to_pylist(), dtype=object
            )
        out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for g in sorted(set(vals.tolist())):
            m = vals == g
            out[g] = (d_all[m][:k_per_group], s_all[m][:k_per_group])
        return out

    def topic_poll(
        self, query: str, checkpoint: int = -1, limit: int = 100
    ) -> tuple[np.ndarray, int]:
        """TopicStream analog (reference TopicStream.java: checkpointed
        pub/sub over an index, resume from stored _version_): return
        matching doc ids with doc_id > checkpoint, in doc order, plus the
        new checkpoint. Batch-append + re-poll yields exactly the new docs
        (at-least-once across a crash: the caller persists the checkpoint)."""
        docs = self.match_docs(query, mode="or")
        fresh = docs[docs > checkpoint][:limit]
        new_ckpt = int(fresh[-1]) if len(fresh) else checkpoint
        return fresh, new_ckpt

    def topk(
        self, query: str, k: int = 10, field: str | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Block-max pruned top-k (identical results to exhaustive)."""
        scorers = self._scorers(query, field=field)
        if not scorers:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        return _topk_blockmax(
            scorers,
            k,
            span_r=int(self.stats.get("max_part_rows", 0)),
            alive_fn=self._alive if len(self.tombstones) else None,
        )

    def cursor_page(
        self,
        query: str,
        k: int,
        cursor: tuple[float, int] | None = None,
        field: str | None = None,
    ) -> tuple[np.ndarray, np.ndarray, tuple[float, int] | None]:
        """CursorMark deep paging (reference CursorMark.java /
        Lucene searchAfter): return the next ``k`` results strictly AFTER
        the cursor position in (score desc, doc asc) total order, plus the
        next cursor. Stateless — the cursor is the last row's (float32
        score, doc id), so any shard/replica can resume the walk; pages
        never skip or repeat rows even when scores tie across pages."""
        scorers = self._scorers(query, field=field)
        if not scorers:
            return np.zeros(0, np.int64), np.zeros(0, np.float32), None
        docs_list, score_list = [], []
        for tp, sc in scorers:
            d, t, m = tp.decode_all()
            alive = self._alive(d)
            if alive is not None:
                d, t, m = d[alive], t[alive], m[alive]
            docs_list.append(d)
            score_list.append(sc.score(t, m))
        d_all, s_all = _topk_from_candidates(docs_list, score_list, 1 << 62)
        if cursor is not None:
            c_s = np.float32(cursor[0])
            after = (s_all < c_s) | ((s_all == c_s) & (d_all > cursor[1]))
            d_all, s_all = d_all[after], s_all[after]
        d_out, s_out = d_all[:k], s_all[:k]
        nxt = (float(s_out[-1]), int(d_out[-1])) if len(d_out) == k else None
        return d_out, s_out, nxt

    def topk_dismax(
        self,
        query: str,
        qf: dict[str, float],
        k: int = 10,
        tie: float = 0.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """edismax per-field scoring (reference ExtendedDismaxQParser:
        ``qf`` per-field boosts + ``tie`` breaker). Per query term, each
        listed field contributes ``boost_f * BM25_f(term)`` with that
        field's own df/docCount/avgdl; the term's score per doc is Lucene's
        DisjunctionMaxQuery combination ``max + tie * (sum - max)``; terms
        then sum (default-OR). Scores accumulate in float64 and round-trip
        through float32 like the single-field path."""
        counts = Counter(self.analyzer.analyze(query))
        docs_list, score_list = [], []
        for tok, n in counts.items():
            per_field: list[tuple[np.ndarray, np.ndarray]] = []
            for fname, boost in qf.items():
                tp = self.term_postings(f"{fname}:{tok}")
                if tp is None:
                    continue
                dc, stf = self._field_collection_stats(fname)
                sc = BM25Scorer(tp.df, dc, stf, boost=float(n) * float(boost))
                d, t, m = tp.decode_all()
                alive = self._alive(d)
                if alive is not None:
                    d, t, m = d[alive], t[alive], m[alive]
                if len(d):
                    per_field.append((d, sc.score(t, m).astype(np.float64)))
            if not per_field:
                continue
            if len(per_field) == 1:
                uniq, comb = per_field[0]
            else:
                all_d = np.concatenate([d for d, _ in per_field])
                all_s = np.concatenate([s for _, s in per_field])
                uniq, inv = np.unique(all_d, return_inverse=True)
                mx = np.full(len(uniq), -np.inf)
                np.maximum.at(mx, inv, all_s)
                sm = np.bincount(inv, weights=all_s, minlength=len(uniq))
                comb = mx + tie * (sm - mx)
            docs_list.append(uniq)
            score_list.append(np.asarray(comb, dtype=np.float32))
        if not docs_list:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        return _topk_from_candidates(docs_list, score_list, k)

    def topk_range(
        self,
        query: str,
        k: int,
        part_lo: int,
        part_hi: int,
        df_override: dict[str, int] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k restricted to doc partitions [part_lo, part_hi) — the
        per-shard leg of scatter/gather."""
        scorers = self._scorers(query, df_override=df_override)
        if not scorers:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        lo, hi = part_lo << 32, (part_hi << 32) - 1
        docs_list, score_list = [], []
        for tp, sc in scorers:
            d, t, m = tp.decode_range(lo, hi)
            alive = self._alive(d)
            if alive is not None:
                d, t, m = d[alive], t[alive], m[alive]
            if len(d):
                docs_list.append(d)
                score_list.append(sc.score(t, m))
        if not docs_list:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        return _topk_from_candidates(docs_list, score_list, k)

    # -- doc resolution -----------------------------------------------------

    def sorted_topk(
        self, k: int = 10, after: tuple[float, int] | None = None
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """Segment-sorted early termination (Lucene <indexSort> +
        TopFieldCollector: when the query sort matches the index-time sort,
        collection stops once a segment/part can no longer contribute).
        Requires a build with ``IndexConfig.sort_field``. Doc parts are
        visited best-first by their manifest (sort_min, sort_max) range;
        within a part rows are index-sorted, so only the first k alive rows
        are candidates; parts whose bound cannot beat the current k-th best
        are never opened. Returns (doc_ids, values, metrics) with
        ``metrics['parts_visited'] <= parts_total`` — the early-termination
        evidence. Tie-break: value, then doc_id ascending (stable across
        any partitioning because doc ids ascend in row order per part).

        ``after=(value, doc_id)`` is the searchAfter/CursorMark
        continuation (Lucene TopFieldCollector after-FieldDoc): only rows
        strictly after the cursor in (value, doc_id) order are candidates,
        and parts wholly before the cursor's value range still early-out
        via the same bound check."""
        sf = self.stats.get("sort_field")
        if sf is None:
            raise ValueError("index was not built with an index-time sort")
        desc = bool(self.stats.get("sort_desc", True))
        parts = [p for p in self.stats["doc_parts"] if p.get("sort_max") is not None]
        parts = sorted(
            parts,
            key=(lambda p: -p["sort_max"]) if desc else (lambda p: p["sort_min"]),
        )
        metrics = {"parts_total": len(parts), "parts_visited": 0, "rows_scanned": 0}
        cv: list[np.ndarray] = []
        cd: list[np.ndarray] = []
        n_cands = 0
        kth: float | None = None
        for p in parts:
            bound = p["sort_max"] if desc else p["sort_min"]
            if kth is not None and n_cands >= k and (bound < kth if desc else bound > kth):
                break  # no remaining part can reach the top-k
            t = pq.read_table(
                os.path.join(self.dir, "docs", f"part-{int(p['part_id']):06d}.parquet"),
                columns=["doc_id", "sortv"],
            )
            d = t.column("doc_id").to_numpy()
            v = t.column("sortv").to_numpy()
            alive = self._alive(d)
            if alive is not None:
                d, v = d[alive], v[alive]
            if after is not None:
                av, ad = after
                m = (v < av) | ((v == av) & (d > ad)) if desc else (v > av) | ((v == av) & (d > ad))
                d, v = d[m], v[m]
            take = min(k, len(d))
            metrics["parts_visited"] += 1
            metrics["rows_scanned"] += take
            cd.append(d[:take])
            cv.append(v[:take])
            n_cands += take
            if n_cands >= k:
                allv = np.concatenate(cv)
                kth = float(
                    np.sort(allv)[::-1][k - 1] if desc else np.sort(allv)[k - 1]
                )
        if not cd:
            z = np.zeros(0, np.int64)
            return z, np.zeros(0, np.float64), metrics
        d_all, v_all = np.concatenate(cd), np.concatenate(cv)
        order = np.lexsort((d_all, -v_all if desc else v_all))[:k]
        return d_all[order], v_all[order], metrics

    def _docs_part(self, part: int) -> pa.Table:
        t = self._docs_cache.get(part)
        if t is None:
            t = pq.read_table(
                os.path.join(self.dir, "docs", f"part-{part:06d}.parquet"),
                columns=["url", "doc_len"],
            )
            self._docs_cache[part] = t
            if len(self._docs_cache) > self._cache_docs_parts:
                self._docs_cache.popitem(last=False)
        return t

    def fetch_fields(self, doc_ids: np.ndarray, columns: list[str]) -> pa.Table:
        """Stored-field retrieval for winning ids — the STAGE_GET_FIELDS
        leg of the distributed query (reference QueryComponent: fields are
        fetched only for merged top-k ids, never during scoring). Returns
        one row per doc id, in the given order."""
        parts = doc_ids >> np.int64(32)
        rows = doc_ids & np.int64(0xFFFFFFFF)
        # group ids by part, one vectorized take per part, then restore the
        # caller's order with one final take (no per-cell Python)
        order = np.argsort(parts, kind="stable")
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        pieces: list[pa.Table] = []
        sorted_parts = parts[order]
        sorted_rows = rows[order]
        bounds = np.flatnonzero(np.diff(sorted_parts) != 0) + 1
        starts = np.concatenate([[0], bounds]).astype(np.int64)
        ends = np.concatenate([bounds, [len(sorted_parts)]]).astype(np.int64)
        for s, e in zip(starts, ends):
            if s == e:
                continue
            part = int(sorted_parts[s])
            t = pq.read_table(
                os.path.join(self.dir, "docs", f"part-{part:06d}.parquet"),
                columns=columns,
            )
            pieces.append(t.take(pa.array(sorted_rows[s:e])))
        if not pieces:
            return pa.table({c: pa.array([]) for c in columns})
        return pa.concat_tables(pieces).take(pa.array(inv))

    def topk_boosted(self, query: str, k: int, boost_fn) -> tuple[np.ndarray, np.ndarray]:
        """Function-query boosting (the `boost`/`func` parser analog,
        reference ValueSourceParser.java): final = bm25 * boost_fn(doc_ids),
        boost computed from stored doc values AFTER text scoring, ranked by
        the boosted score (desc, doc asc). Boosted scores are this engine's
        own semantics (documented), not a Lucene parity surface."""
        scorers = self._scorers(query)
        if not scorers:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        docs_list, score_list = [], []
        for tp, sc in scorers:
            d, t, m = tp.decode_all()
            alive = self._alive(d)
            if alive is not None:
                d, t, m = d[alive], t[alive], m[alive]
            docs_list.append(d)
            score_list.append(sc.score(t, m))
        d_all, s_all = _topk_from_candidates(docs_list, score_list, 10**9)
        boosted = (s_all.astype(np.float64) * boost_fn(d_all)).astype(np.float32)
        order = np.lexsort((d_all, -boosted.astype(np.float64)))[:k]
        return d_all[order], boosted[order]

    def urls_for(self, doc_ids: np.ndarray) -> list[str]:
        out = []
        for d in doc_ids:
            part, row = int(d) >> 32, int(d) & 0xFFFFFFFF
            out.append(self._docs_part(part).column("url")[row].as_py())
        return out

    def close(self):
        for r in self._readers.values():
            r.close()


def _topk_from_candidates(docs_list, score_list, k) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-term (doc, score_f32) candidates: float64-accumulate per doc
    (DisjunctionSumScorer), cast float32, order by (score desc, doc asc).

    Accumulation uses a dense bincount keyed on (part, row) when the dense
    space is small enough (vectorized C, no sort); falls back to the
    sort-based unique for sparse doc-id spaces (huge part counts)."""
    all_docs = np.concatenate(docs_list)
    all_scores = np.concatenate([s.astype(np.float64) for s in score_list])
    if len(all_docs) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    parts = all_docs >> np.int64(32)
    rows = all_docs & np.int64(0xFFFFFFFF)
    span_p = int(parts.max()) + 1
    span_r = int(rows.max()) + 1
    if span_p * span_r <= 1 << 23:  # ≤ 8M-slot dense space (64 MB f64)
        key = parts * span_r + rows
        acc = np.bincount(key, weights=all_scores, minlength=span_p * span_r)
        nz = np.flatnonzero(acc)
        uniq = (nz // span_r) * (1 << 32) + nz % span_r
        final = acc[nz].astype(np.float32)
    else:
        uniq, inv = np.unique(all_docs, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, all_scores)
        final = acc.astype(np.float32)
    if k < len(final):
        # exact pre-cut: keep every candidate scoring >= the k-th best
        # (ties at the boundary all survive, so doc-asc tie-break is exact)
        kth = np.partition(final, len(final) - k)[len(final) - k]
        keep = final >= kth
        uniq, final = uniq[keep], final[keep]
    order = np.lexsort((uniq, -final.astype(np.float64)))[:k]
    return uniq[order], final[order]


def _topk_blockmax(scorers, k, span_r: int = 0, alive_fn=None) -> tuple[np.ndarray, np.ndarray]:
    """Region-at-a-time block-max evaluation, batch-vectorized.

    Doc space is partitioned into regions by the union of all terms' block
    boundaries; each region's bound is the sum of the overlapping blocks'
    impact bounds. Regions are processed in descending bound order in
    geometrically growing ROUNDS: each round batch-decodes every block any
    selected region touches (one vectorized decode + one score call per
    term), masks postings to the selected regions, accumulates real scores
    and tightens the threshold. Once the k-th best real score exceeds the
    next region's bound the rest are pruned without decoding (bound ==
    threshold is still visited so doc-id tie-breaks match exhaustive
    evaluation exactly).
    """
    term_blocks = []
    for tp, sc in scorers:
        lasts, max_tf, min_norm, _, _ = tp.global_blocks()
        bounds = sc.score(max_tf, min_norm.astype(np.uint8)).astype(np.float64)
        term_blocks.append((tp, sc, lasts, bounds))

    edges = np.unique(np.concatenate([lasts for _, _, lasts, _ in term_blocks]))
    n_regions = len(edges)
    region_bound = np.zeros(n_regions, dtype=np.float64)
    block_of_region = []
    for _, _, lasts, bounds in term_blocks:
        # block covering region r = first block with last_doc >= region_hi[r]
        bi = np.searchsorted(lasts, edges, side="left")
        valid = bi < len(lasts)
        region_bound[valid] += bounds[np.minimum(bi, len(lasts) - 1)][valid]
        block_of_region.append((bi, valid))

    order = np.argsort(-region_bound, kind="stable")
    max_doc = int(edges[-1])
    span_p = (max_doc >> 32) + 1
    # span_r must be an upper bound on ANY row id (a block can span doc
    # partitions, so the max doc's row alone is not a bound) — the build
    # records it in stats.json; without it, fall back to sparse merge
    dense_ok = span_r > 0 and span_p * span_r <= 1 << 23
    if dense_ok:
        # one persistent float64 accumulator across rounds: scores sum as
        # float64 per doc (DisjunctionSumScorer), no per-round sorting
        acc = np.zeros(span_p * span_r, dtype=np.float64)
    else:
        docs_acc: list[np.ndarray] = []
        scores_acc: list[np.ndarray] = []
    threshold = -np.inf
    n_cand = 0
    pos = 0
    rounds = 64
    sel_mask = np.zeros(n_regions, dtype=bool)
    while pos < len(order):
        sel = order[pos : pos + rounds]
        pos += len(sel)
        rounds = min(rounds * 4, 1 << 16)
        if n_cand >= k:
            keep = region_bound[sel] >= threshold
            if not keep[0]:
                break  # order is descending: everything left is below θ
            sel = sel[keep]
            # adaptive: if pruning is not biting (most remaining regions
            # still beat θ), stop paying per-round overheads — finish
            # everything in this round
            if pos < len(order) and keep.mean() > 0.6:
                rest = order[pos:]
                rest = rest[region_bound[rest] >= threshold]
                sel = np.concatenate([sel, rest])
                pos = len(order)
        sel_mask[:] = False
        sel_mask[sel] = True
        round_n = 0
        dl, sl = [], []
        for (tp, sc, lasts, _), (bi_r, valid_r) in zip(term_blocks, block_of_region):
            gbis = np.unique(bi_r[sel[valid_r[sel]]])
            if len(gbis) == 0:
                continue
            if len(gbis) >= 0.9 * len(lasts):
                # decoding (almost) the whole list: use the full-decode
                # cache; the region mask below drops any extra postings
                d, t, m = tp.decode_all_cached()
            else:
                d, t, m = tp.decode_blocks_global(gbis)
            # keep only postings whose region is selected this round (a
            # block can span regions; the rest decode in their own round)
            rid = np.searchsorted(edges, d, side="left")
            keep = sel_mask[rid]
            if alive_fn is not None:
                a = alive_fn(d)
                if a is not None:
                    keep = keep & a  # tombstones masked BEFORE θ accumulation
            if keep.any():
                d, s = d[keep], sc.score(t[keep], m[keep])
                if dense_ok:
                    key = (d >> np.int64(32)) * span_r + (d & np.int64(0xFFFFFFFF))
                    acc += np.bincount(key, weights=s.astype(np.float64), minlength=len(acc))
                    round_n += len(d)
                else:
                    dl.append(d)
                    sl.append(s)
        if dense_ok:
            if round_n:
                n_cand += round_n  # counts postings, >= distinct docs — safe for >= k gate
                if n_cand >= k and len(acc) > k:
                    kth = np.partition(acc, len(acc) - k)[len(acc) - k]
                    if kth > 0:
                        # float32(kth) can round ABOVE the true float64 kth;
                        # a region bound in [kth, float32(kth)) would then be
                        # pruned though it may hold a score-tying doc. Step
                        # one ulp down so ">= threshold keeps ties" holds.
                        t32 = np.float32(kth)
                        if float(t32) > float(kth):
                            t32 = np.nextafter(t32, np.float32(-np.inf))
                        threshold = float(t32)
        elif dl:
            d, s = _topk_from_candidates(dl, sl, 10**9)
            docs_acc.append(d)
            scores_acc.append(s)
            n_cand += len(d)
            all_s = np.concatenate(scores_acc)
            if len(all_s) >= k:
                threshold = float(np.partition(all_s, -k)[-k])
    if dense_ok:
        nz = np.flatnonzero(acc)
        if len(nz) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        docs = (nz // span_r) * (1 << 32) + nz % span_r
        scores = acc[nz].astype(np.float32)
    else:
        if not docs_acc:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        docs = np.concatenate(docs_acc)
        scores = np.concatenate(scores_acc)
    if k < len(scores):
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        keep = scores >= kth
        docs, scores = docs[keep], scores[keep]
    order2 = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return docs[order2], scores[order2]


def merge_topk(
    results: list[tuple[np.ndarray, np.ndarray]], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Coordinator k-way merge with the reference tie-break (score desc,
    doc_id asc) — the QueryComponent.mergeIds analog (reference
    ``ShardFieldSortedHitQueue.java:82-107``; our deterministic tie-break is
    doc-id ascending, matching the single-index Lucene collector)."""
    docs = np.concatenate([r[0] for r in results]) if results else np.zeros(0, np.int64)
    scores = np.concatenate([r[1] for r in results]) if results else np.zeros(0, np.float32)
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return docs[order], scores[order]


class TopKQueryActor:
    """Stateful query-serving stage for ``Dataset.map_batches``.

    __init__ runs once per actor (opens the index — term dicts, mmaps);
    __call__ scores a batch of queries. Input columns: ``qid:int64,
    query:string, k:int32``; output: one row per hit with
    ``qid, rank, doc_id, url, score``.
    """

    def __init__(self, index_dir: str, resolve_urls: bool = True, use_blockmax: bool = True):
        self.reader = IndexReader(index_dir)
        self.resolve_urls = resolve_urls
        self.use_blockmax = use_blockmax

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, doc_ids, scores = [], [], [], []
        urls: list[str] = []
        for i in range(batch.num_rows):
            qid = batch.column("qid")[i].as_py()
            query = batch.column("query")[i].as_py()
            k = int(batch.column("k")[i].as_py()) if "k" in batch.column_names else 10
            fn = self.reader.topk if self.use_blockmax else self.reader.topk_exhaustive
            d, s = fn(query, k)
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            doc_ids.extend(d.tolist())
            scores.extend(s.tolist())
            if self.resolve_urls:
                urls.extend(self.reader.urls_for(d))
        cols = {
            "qid": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score": pa.array(np.array(scores, dtype=np.float32)),
        }
        if self.resolve_urls:
            cols["url"] = pa.array(urls, pa.string())
        return pa.table(cols)


class ShardedQueryService:
    """Memory-bounded distributed serving: each actor owns a DOC-RANGE
    shard and opens only the segments overlapping it — the SolrCloud
    collection-of-shards architecture (reference: one core per shard,
    scatter-gather in ``HttpShardHandler`` / ``QueryComponent.mergeIds``).

    At 10^12 docs no single node can hold the whole term dictionary set;
    the doc-range split bounds per-actor memory to its shard's segments
    (doc-range `salt` chunks written by the storage shuffle align with
    this: a shard touches ceil(parts/n_shards / chunk) salt files per
    tkey). Scores are exact: global BM25 stats come from the build
    (ExactStatsCache semantics), so per-shard scoring + k-way merge is
    rank- and score-identical to a single evaluator."""

    def __init__(self, index_dir: str, n_shards: int = 4):
        import ray

        man = read_json(os.path.join(index_dir, "index_manifest.json"))
        n_parts = man["stats"]["n_doc_parts"]
        n_shards = max(1, min(n_shards, n_parts))
        bounds = np.linspace(0, n_parts, n_shards + 1).astype(int)

        @ray.remote(num_cpus=1)
        class _Shard:
            def __init__(self, index_dir: str, lo: int, hi: int):
                self.reader = IndexReader(index_dir, part_range=(lo, hi))
                self.lo, self.hi = lo, hi

            def topk(self, query: str, k: int, stats: dict):
                d, s = self.reader.topk_range(
                    query, k, self.lo, self.hi, df_override=stats
                )
                return d, s

            def ping(self):
                return True

        self._ray = ray
        self.actors = [
            _Shard.remote(index_dir, int(lo), int(hi))
            for lo, hi in zip(bounds[:-1], bounds[1:])
            if hi > lo
        ]
        # coordinator-side stats reader: term-dict lookups only (the
        # ExactStatsCache role); postings are never decoded here
        self._stats_reader = IndexReader(index_dir)

    def warmup(self) -> None:
        self._ray.get([a.ping.remote() for a in self.actors])

    def topk(self, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Scatter to every shard with the global term stats, gather, k-way
        merge with the reference tie-break — one query, shard-parallel."""
        stats = self._stats_reader.term_stats_map(query)
        parts = self._ray.get([a.topk.remote(query, k, stats) for a in self.actors])
        return merge_topk(parts, k)

    def shutdown(self) -> None:
        for a in self.actors:
            self._ray.kill(a)
        self.actors = []


class QueryService:
    """Long-lived distributed query serving — the SolrCloud
    searcher/replica analog (reference: ``SolrIndexSearcher`` held open per
    core, queries load-balanced across replicas via ``HttpShardHandler``,
    ``solr/core/src/java/org/apache/solr/handler/component/SearchHandler.java:219-420``).

    An explicit pool of Ray actors, each holding the whole index open
    (term dictionaries in memory, postings mmap'd); query batches are
    round-robin dispatched. Unlike the ``Dataset.map_batches`` path this
    pool outlives any one dataset execution — the right shape for online
    serving and for steady-state QPS measurement.
    """

    def __init__(self, index_dir: str, n_actors: int = 4, use_blockmax: bool = True):
        import ray

        @ray.remote(num_cpus=1)
        class _QueryWorker:
            def __init__(self, index_dir: str, use_blockmax: bool):
                self.inner = TopKQueryActor(
                    index_dir, resolve_urls=False, use_blockmax=use_blockmax
                )

            def query_batch(self, qids: list[int], queries: list[str], k: int) -> pa.Table:
                tbl = pa.table(
                    {
                        "qid": pa.array(qids, pa.int64()),
                        "query": pa.array(queries, pa.string()),
                        "k": pa.array([k] * len(qids), pa.int32()),
                    }
                )
                return self.inner(tbl)

            def query_many(self, queries: list[str], k: int, passes: int) -> int:
                """Serve a query list `passes` times; returns total hit rows.
                The whole loop runs actor-side — one remote call per actor —
                so a throughput measurement has no driver dispatch on the
                critical path."""
                n = 0
                r = self.inner.reader
                for _ in range(passes):
                    for q in queries:
                        d, _s = r.topk(q, k)
                        n += len(d)
                return n

            def ping(self) -> bool:
                return True

        self._ray = ray
        self.actors = [
            _QueryWorker.remote(index_dir, use_blockmax) for _ in range(max(1, n_actors))
        ]

    def warmup(self) -> None:
        """Block until every actor has opened the index."""
        self._ray.get([a.ping.remote() for a in self.actors])

    def _submit(self, queries: list[str], k: int, batch_size: int):
        futs = []
        for i in range(0, len(queries), batch_size):
            chunk = queries[i : i + batch_size]
            actor = self.actors[(i // batch_size) % len(self.actors)]
            futs.append(actor.query_batch.remote(list(range(i, i + len(chunk))), chunk, k))
        return futs

    def topk_many(self, queries: list[str], k: int = 10, batch_size: int = 8) -> pa.Table:
        """Score queries across the pool; returns one row per hit."""
        return pa.concat_tables(self._ray.get(self._submit(queries, k, batch_size)))

    def topk_many_count(self, queries: list[str], k: int = 10, batch_size: int = 8) -> int:
        """Throughput-measurement variant: total hit rows, no driver concat
        (the driver should not be part of a QPS measurement)."""
        return sum(t.num_rows for t in self._ray.get(self._submit(queries, k, batch_size)))

    def bench_qps(self, queries: list[str], k: int = 10, passes: int = 1) -> int:
        """Throughput measurement: queries are deterministically shuffled
        and striped across the pool, ONE remote call per actor with the
        pass loop actor-side — the driver is entirely off the critical
        path and each actor gets a fair head/tail mix."""
        perm = np.random.default_rng(0).permutation(len(queries))
        shuffled = [queries[i] for i in perm]
        n_act = len(self.actors)
        futs = [
            a.query_many.remote(shuffled[ai::n_act], k, passes)
            for ai, a in enumerate(self.actors)
        ]
        return sum(self._ray.get(futs))

    def shutdown(self) -> None:
        for a in self.actors:
            self._ray.kill(a)
        self.actors = []


def scatter_gather_topk(index_dir: str, query: str, k: int, n_shards: int = 4):
    """Distributed single-query evaluation: doc-range shards scored in
    parallel Ray tasks, coordinator merge. Returns (doc_ids, scores)."""
    import ray

    reader = IndexReader(index_dir)
    n_parts = reader.n_doc_parts
    n_shards = max(1, min(n_shards, n_parts))
    bounds = np.linspace(0, n_parts, n_shards + 1).astype(int)

    @ray.remote
    def score_shard(lo: int, hi: int):
        r = IndexReader(index_dir)
        try:
            return r.topk_range(query, k, lo, hi)
        finally:
            r.close()

    futs = [
        score_shard.remote(int(lo), int(hi))
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    return merge_topk(ray.get(futs), k)


def timed_partial_topk(
    index_dir: str,
    query: str,
    k: int,
    time_allowed_s: float | None,
    n_shards: int = 4,
    tolerant: bool = False,
):
    """``timeAllowed`` / partialResults + ``shards.tolerant`` (reference:
    SolrIndexSearcher wraps collectors in Lucene's TimeLimitingCollector
    when ``timeAllowed`` is set — an expired budget returns what was
    collected with ``partialResults=true``; and with
    ``shards.tolerant=true`` (ShardParams.SHARDS_TOLERANT, used by
    HttpShardHandler) a FAILED shard is skipped instead of failing the
    whole request, again flagged partial — solrcloud-distributed docs).

    Distributed form: the doc-range shards of ``scatter_gather_topk`` are
    dispatched in parallel; the coordinator stops WAITING once the budget
    expires (ray.wait with the remaining timeout) and merges only the
    shards that finished; with ``tolerant`` a shard whose task RAISED is
    dropped from the merge instead of propagating. At least one shard is
    always awaited so a tiny budget still returns results.
    Returns (doc_ids, scores, partial: bool, shards_scored: int).
    """
    import time

    import ray

    reader = IndexReader(index_dir)
    n_parts = reader.n_doc_parts
    reader.close()
    n_shards = max(1, min(n_shards, n_parts))
    bounds = np.linspace(0, n_parts, n_shards + 1).astype(int)

    @ray.remote
    def score_shard(lo: int, hi: int):
        r = IndexReader(index_dir)
        try:
            return r.topk_range(query, k, lo, hi)
        finally:
            r.close()

    futs = [
        score_shard.remote(int(lo), int(hi))
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]

    def gather(refs):
        """ray.get each ref; with tolerant, count and drop failed shards."""
        out, failed = [], 0
        for f in refs:
            try:
                out.append(ray.get(f))
            except Exception:
                if not tolerant:
                    raise
                failed += 1
        return out, failed

    if time_allowed_s is None:
        results, failed = gather(futs)
        d, s = merge_topk(results, k)
        return d, s, failed > 0, len(results)

    deadline = time.monotonic() + time_allowed_s
    ready, pending = ray.wait(futs, num_returns=1)  # always await one shard
    while pending:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        r2, pending = ray.wait(
            pending, num_returns=len(pending), timeout=remaining
        )
        ready += r2
    for f in pending:
        ray.cancel(f, force=True)
    results, failed = gather(ready)
    d, s = merge_topk(results, k)
    return d, s, bool(pending) or failed > 0, len(results)


def calculate_min_should_match(optional_clause_count: int, spec: str) -> int:
    """Solr's ``mm`` spec language (reference
    solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java:635
    ``calculateMinShouldMatch`` — ported op-for-op): plain integers,
    negatives ("leave this many unmatched"), percentages (negative
    percentages likewise subtract, truncating toward zero exactly like
    the reference's ``(int) calc`` cast), and conditional
    ``upper<spec`` chains evaluated left to right, where the first
    condition with clause-count <= upperBound short-circuits to the
    running result."""
    import re

    result = optional_clause_count
    spec = spec.strip()

    if "<" in spec:
        spec = re.sub(r"(\s+<\s*)|(\s*<\s+)", "<", spec)
        for s in spec.split(" "):
            parts = s.split("<")
            if len(parts) < 2 or not parts[0]:
                raise ValueError(f"Invalid 'mm' spec: {s!r}")
            upper = int(parts[0])
            if optional_clause_count <= upper:
                return result
            result = calculate_min_should_match(optional_clause_count, parts[1])
        return result

    if "%" in spec:
        percent = int(spec[: spec.index("%")])
        calc = (result * percent) / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc

    if optional_clause_count < result:
        return optional_clause_count
    return 0 if result < 0 else result
