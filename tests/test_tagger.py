"""Dictionary tagger conformance (SolrTextTagger analog): ALL-matches
equals a brute per-doc scan, and LONGEST_DOMINANT_RIGHT equals the
reference greedy (longest first, right-most on ties, survivors suppress
overlaps)."""

import re

import pyarrow.parquet as pq

from apache___solr_ray.stages.tagger import TAGGER_DICT

SF = "/root/testdata/sf0.001"


def _brute(texts):
    """doc_id -> list[(tag, start, end)] — all matches."""
    out = {}
    for d, text in texts.items():
        toks = re.findall(r"[a-z0-9]+", (text or "").lower())
        ms = []
        for terms in TAGGER_DICT:
            L = len(terms)
            for i in range(len(toks) - L + 1):
                if toks[i : i + L] == terms:
                    ms.append((" ".join(terms), i, i + L))
        out[d] = ms
    return out


def _ldr(ms):
    """reference greedy: longest wins, right-most on ties, suppression."""
    kept = []
    for tag, s, e in sorted(ms, key=lambda m: (-(m[2] - m[1]), -m[1])):
        if all(e <= a or s >= b for _, a, b in kept):
            kept.append((tag, s, e))
    return sorted(kept)


def test_tagger_all_and_ldr_match_brute(ray_session):
    from apache___solr_ray.pipelines.text import QUERIES

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want_all = _brute(texts)

    got_all = QUERIES["tagger_dict_matches"](SF).to_pandas()
    by_doc = {
        d: sorted(zip(g.tag, g.start_pos, g.end_pos))
        for d, g in got_all.groupby("doc_id")
    }
    for d, ms in want_all.items():
        assert by_doc.get(d, []) == sorted(ms), f"ALL mismatch doc {d}"

    got_ldr = QUERIES["tagger_ldr_matches"](SF).to_pandas()
    by_doc_l = {
        d: sorted(zip(g.tag, g.start_pos, g.end_pos))
        for d, g in got_ldr.groupby("doc_id")
    }
    for d, ms in want_all.items():
        want = _ldr(ms)
        assert by_doc_l.get(d, []) == want, f"LDR mismatch doc {d}"
        # survivors never overlap
        spans = sorted((s, e) for _, s, e in want)
        assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))
