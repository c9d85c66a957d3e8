"""Dictionary text tagger (reference: the Solr tagger module —
solr/modules/analysis-extras' TaggerRequestHandler, the SolrTextTagger:
find all occurrences of dictionary phrases inside a text field, reporting
token offsets, with an `overlaps` mode resolving overlapping tags).

Ray-Data shape: a callable CLASS for ``map_batches`` — the phrase
dictionary is compiled once per actor in ``__init__`` (the reference
builds an FST from the tag corpus once per core); ``__call__`` matches a
whole Arrow batch with numpy over a flattened token stream (dictionary
codes, windowed equality) — no Python loop over tokens. At 100 TB the
dictionary rides along broadcast once per actor (pass phrases, or a
``ray.put`` handle for very large dictionaries).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from apache___solr_ray.analyze import SIMPLE_TOKEN_RE

#: default tag dictionary used by the query entries (tag = joined phrase)
TAGGER_DICT: list[list[str]] = [
    ["merge", "join"],
    ["hash", "join"],
    ["join"],
    ["fast"],
    ["stream", "batch"],
]

_SCHEMA = pa.schema(
    [
        ("tag", pa.string()),
        ("doc_id", pa.int64()),
        ("start_pos", pa.int64()),
        ("end_pos", pa.int64()),
    ]
)


class DictionaryTagger:
    """Emit (tag, doc_id, start_pos, end_pos) for every dictionary-phrase
    occurrence (token-aligned, like the reference's startOffset/endOffset
    but in token positions). ``overlaps='ALL'`` semantics."""

    def __init__(self, phrases: list[list[str]] | None = None):
        phrases = TAGGER_DICT if phrases is None else phrases
        self.phrases: list[tuple[tuple[str, ...], str]] = [
            (tuple(p), " ".join(p)) for p in phrases
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        findall = SIMPLE_TOKEN_RE.findall
        flat: list[str] = []
        counts = np.empty(batch.num_rows, dtype=np.int64)
        for i, text in enumerate(batch.column("text").to_pylist()):
            toks = findall((text or "").lower())
            counts[i] = len(toks)
            flat += toks
        if not flat:
            return _SCHEMA.empty_table()
        denc = pc.dictionary_encode(pa.array(flat, pa.string()))
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = {t: c for c, t in enumerate(denc.dictionary.to_pylist())}
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos_in_doc = np.arange(len(codes), dtype=np.int64) - offsets[doc_of]

        tag_out: list[str] = []
        id_out: list[np.ndarray] = []
        s_out: list[np.ndarray] = []
        e_out: list[np.ndarray] = []
        n = len(codes)
        for terms, tag in self.phrases:
            cs = [vocab.get(t, -1) for t in terms]
            L = len(terms)
            if any(c < 0 for c in cs) or n < L:
                continue
            m = codes[: n - L + 1] == cs[0]
            for j in range(1, L):
                m &= codes[j : n - L + 1 + j] == cs[j]
            if L > 1:  # phrase must not cross a document boundary
                m &= doc_of[: n - L + 1] == doc_of[L - 1 :]
            idx = np.flatnonzero(m)
            if len(idx) == 0:
                continue
            tag_out.extend([tag] * len(idx))
            id_out.append(ids[doc_of[idx]])
            s_out.append(pos_in_doc[idx])
            e_out.append(pos_in_doc[idx] + L)
        if not tag_out:
            return _SCHEMA.empty_table()
        return pa.table(
            {
                "tag": pa.array(tag_out, pa.string()),
                "doc_id": pa.array(np.concatenate(id_out), pa.int64()),
                "start_pos": pa.array(np.concatenate(s_out), pa.int64()),
                "end_pos": pa.array(np.concatenate(e_out), pa.int64()),
            }
        )


class DictionaryTaggerLDR(DictionaryTagger):
    """Tagger with LONGEST_DOMINANT_RIGHT resolution fused into the same
    batch call — every doc's matches are complete within one input batch
    (docs never split across batches), so per-doc suppression here is
    exact; running ``resolve_ldr`` as a separate map stage would NOT be
    (downstream re-batching can split one doc's matches)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return resolve_ldr(super().__call__(batch))


def resolve_ldr(batch: pa.Table) -> pa.Table:
    """LONGEST_DOMINANT_RIGHT overlap resolution (the reference tagger's
    default ``overlaps`` mode: longest match wins; among equal lengths the
    right-most wins; survivors suppress anything they overlap). Requires
    ALL matches of a doc in the batch (see DictionaryTaggerLDR). Cost is
    O(matches), not O(corpus); the per-candidate loop runs only on docs
    that matched at all."""
    if batch.num_rows == 0:
        return batch
    doc = batch.column("doc_id").to_numpy()
    s = batch.column("start_pos").to_numpy()
    e = batch.column("end_pos").to_numpy()
    ln = e - s
    # priority order: per doc, longest first, then right-most start
    order = np.lexsort((-s, -ln, doc))
    keep = np.zeros(len(doc), dtype=bool)
    taken: dict[int, list[tuple[int, int]]] = {}
    for i in order:
        d = int(doc[i])
        iv = taken.setdefault(d, [])
        si, ei = int(s[i]), int(e[i])
        if all(ei <= a or si >= b for a, b in iv):
            iv.append((si, ei))
            keep[i] = True
    return batch.filter(pa.array(keep))
