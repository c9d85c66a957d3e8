"""Analysis chain: StandardTokenizer-equivalent → StopFilter → LowerCaseFilter.

Rebuilds the reference's default ``text_general`` chain
(``solr/server/solr/configsets/_default/conf/managed-schema.xml:299-315``):
``StandardTokenizer → StopFilter(stopwords.txt, ignoreCase) → LowerCaseFilter``
— where the shipped ``stopwords.txt`` is empty, so stop filtering is a no-op
by default (conformance-relevant: head terms stay in the index).

Tokenizer semantics: a documented approximation of UAX#29 word boundaries as
used by Lucene's StandardTokenizer (reference docs
``solr/solr-ref-guide/modules/indexing-guide/pages/tokenizers.adoc:115-127``):

- a token is a maximal run of word characters (``\\w``: letters, digits,
  underscore — underscore joins like UAX#29 ExtendNumLet),
- ``.`` ``'`` ``’`` join two letters (MidNumLet/MidLetter: ``example.com``,
  ``don't`` are single tokens),
- ``.`` ``,`` join two digits (MidNum: ``3.14``, ``1,000``),
- hyphens, ``@``, and all other punctuation split,
- tokens longer than 255 chars are emitted in 255-char pieces
  (``maxTokenLength`` semantics),
- LowerCaseFilter == ``str.lower()`` applied after tokenization.

``doc_len`` (the BM25 length norm input) counts tokens after the full chain
(post-stop-filter), matching Lucene's norm calculation with
discountOverlaps=true (no overlapping tokens are produced by this chain).

The batch path is vectorized: per-doc C-regex findall, then Arrow
dictionary-encode + numpy unique for (term, doc, tf) aggregation — no Python
loops over tokens.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_TOKEN_LENGTH = 255

TOKEN_RE = re.compile(
    r"\w+(?:(?:(?<=\d)[.,](?=\d)|(?<=[^\W\d_])['’.](?=[^\W\d_]))\w+)*",
    re.UNICODE,
)


def tokenize(text: str) -> list[str]:
    """StandardTokenizer-equivalent: raw (pre-filter) tokens, original case."""
    toks = TOKEN_RE.findall(text)
    out = []
    for t in toks:
        if len(t) <= MAX_TOKEN_LENGTH:
            out.append(t)
        else:
            out.extend(t[i : i + MAX_TOKEN_LENGTH] for i in range(0, len(t), MAX_TOKEN_LENGTH))
    return out


@dataclass
class Analyzer:
    """The full chain. Construct once per actor/task; reuse across batches."""

    stopwords: frozenset[str] = field(default_factory=frozenset)  # default: empty, like the reference

    def analyze(self, text: str) -> list[str]:
        toks = [t.lower() for t in tokenize(text)]
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        return toks

    # -- vectorized batch path ------------------------------------------------

    def term_freqs(
        self, texts: list[str] | pa.Array, positions: bool = False
    ) -> tuple:
        """Batch → per-(doc,term) tf tuples.

        Returns ``(terms, doc_idx, tf, doc_len)`` where ``terms`` is a
        pa.StringArray aligned with ``doc_idx``/``tf`` (one row per distinct
        (doc, term) pair, doc-major then term-sorted within doc is NOT
        guaranteed), and ``doc_len[d]`` is the analyzed token count of doc d.

        With ``positions=True`` a fifth element is returned: a
        ``pa.BinaryArray`` aligned with the pairs, each value the VInt
        gap-encoded ascending position list of that (doc, term) pair.
        Positions are the token index BEFORE stop-filtering (Lucene
        StopFilter position-increment semantics: removed stopwords leave
        gaps), 0-based.
        """
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        # single flat token list, C-level extend; the 255-char split is a
        # rare slow path guarded by one max() scan instead of a per-token
        # Python loop
        flat: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        findall = TOKEN_RE.findall
        for i, t in enumerate(texts):
            toks = findall(t or "")
            if toks and max(map(len, toks)) > MAX_TOKEN_LENGTH:
                toks = [
                    piece
                    for tok in toks
                    for piece in (
                        (tok,)
                        if len(tok) <= MAX_TOKEN_LENGTH
                        else tuple(
                            tok[j : j + MAX_TOKEN_LENGTH]
                            for j in range(0, len(tok), MAX_TOKEN_LENGTH)
                        )
                    )
                ]
            counts[i] = len(toks)
            flat += toks
        if not flat:
            empty = pa.array([], type=pa.string())
            base = (empty, np.array([], np.int64), np.array([], np.int64), counts)
            if positions:
                return base + (pa.array([], type=pa.binary()),)
            return base
        arr = pa.array(flat, type=pa.string())
        arr = pc.utf8_lower(arr)
        dict_arr = pc.dictionary_encode(arr)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = dict_arr.dictionary
        doc_of_token = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        tok_pos = None
        if positions:
            # token index within its doc, pre-stop-filter (posIncrement)
            doc_starts = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=doc_starts[1:])
            tok_pos = np.arange(len(codes), dtype=np.int64) - doc_starts[doc_of_token]
        if self.stopwords:
            stop_mask = np.array([v in self.stopwords for v in vocab.to_pylist()], dtype=bool)
            keep = ~stop_mask[codes]
            codes = codes[keep]
            doc_of_token = doc_of_token[keep]
            if tok_pos is not None:
                tok_pos = tok_pos[keep]
            counts = np.bincount(doc_of_token, minlength=len(counts)).astype(np.int64)
        # combined (doc, term) key -> tf
        nvocab = len(vocab)
        key = doc_of_token * nvocab + codes
        if not positions:
            uniq, tf = np.unique(key, return_counts=True)
            doc_idx = uniq // nvocab
            term_codes = (uniq % nvocab).astype(np.int64)
            terms = pc.take(vocab, pa.array(term_codes))
            return terms, doc_idx, tf.astype(np.int64), counts
        # positions path: stable sort keeps each pair's positions ascending
        order = np.argsort(key, kind="stable")
        ks = key[order]
        ps = tok_pos[order]
        change = np.flatnonzero(np.diff(ks) != 0) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(ks)]])
        tf = (ends - starts).astype(np.int64)
        pair_keys = ks[starts]
        doc_idx = pair_keys // nvocab
        term_codes = (pair_keys % nvocab).astype(np.int64)
        terms = pc.take(vocab, pa.array(term_codes))
        from apache___solr_ray.codec import _varint_fill, _varint_lengths

        gaps = np.empty(len(ps), dtype=np.uint64)
        if len(ps):
            gaps[0] = ps[0]
            gaps[1:] = (ps[1:] - ps[:-1]).astype(np.uint64)
            gaps[starts] = ps[starts].astype(np.uint64)
        byte_off = np.zeros(len(ps) + 1, dtype=np.int64)
        np.cumsum(_varint_lengths(gaps), out=byte_off[1:])
        stream = _varint_fill(gaps, np.diff(byte_off), byte_off)
        # zero-copy BinaryArray over the stream: pair i's bytes are
        # stream[byte_off[starts[i]] : byte_off[ends[i]]], and runs are
        # consecutive, so the value offsets are just byte_off at run starts
        offsets = byte_off[np.concatenate([starts, [len(ps)]])].astype(np.int32)
        pos_arr = pa.Array.from_buffers(
            pa.binary(), len(starts), [None, pa.py_buffer(offsets), pa.py_buffer(stream)]
        )
        return terms, doc_idx, tf, counts, pos_arr


#: Simple tokenizer used by the SQL-oracle-checked text operators: lowercase
#: ``[a-z0-9]+`` runs — exactly DuckDB's
#: ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` minus empty strings.
SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9]+")


def simple_tokenize(text: str) -> list[str]:
    return SIMPLE_TOKEN_RE.findall(text.lower())


# ---------------------------------------------------------------------------
# Optional token-filter factories — the configurable analysis-chain surface
# (reference: hundreds of filter factories enumerated in
# solr/solr-ref-guide/modules/indexing-guide/pages/filters.adoc; chains are
# assembled per field type, FieldTypePluginLoader.java:179-330). These are
# NOT in the default text_general chain (which stays frozen for parity);
# compose them explicitly: Analyzer() output -> filter -> filter.
# ---------------------------------------------------------------------------


def shingle_filter(tokens: list[str], n: int = 2, sep: str = " ") -> list[str]:
    """ShingleFilter analog: token n-grams (word shingles), order-preserving.
    Emits only the n-grams (outputUnigrams=false shape)."""
    if len(tokens) < n:
        return []
    return [sep.join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def synonym_filter(tokens: list[str], mapping: dict[str, str]) -> list[str]:
    """SynonymGraphFilter (replace-mode) analog: single-token synonym map
    applied after lowercasing; unmapped tokens pass through."""
    return [mapping.get(t, t) for t in tokens]


def minimal_plural_stem(token: str) -> str:
    """Documented minimal English plural stemmer (frozen spec, in the
    spirit of Lucene's EnglishMinimalStemFilter — semantics are THIS
    engine's documented rules, mirrored exactly by the SQL oracle):

    - tokens shorter than 4 chars are unchanged,
    - tokens ending in 'ss' or 'us' are unchanged,
    - otherwise a trailing 's' is dropped.
    """
    if len(token) < 4 or not token.endswith("s"):
        return token
    if token.endswith(("ss", "us")):
        return token
    return token[:-1]


def stem_filter(tokens: list[str]) -> list[str]:
    return [minimal_plural_stem(t) for t in tokens]
