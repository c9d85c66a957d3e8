"""Posting-list codec: delta + VInt compression with block-max skip metadata.

Rebuilds the role of Lucene's postings format (doc-delta VInt within 128-doc
blocks, per-block skip/impact ("block-max") data — [Lucene 10.4 library]
semantics, configured by the reference at
``solr/core/src/java/org/apache/solr/update/SolrIndexConfig.java:242-289``)
as a numpy-codable layout.

Per-term payload::

    u16 n_blocks
    u32 d_len            (delta VInt stream length in bytes)
    u32 t_len            (tf VInt stream length in bytes)
    u32 p_len            (position VInt stream length in bytes; 0 = field
                          indexed without positions — omitTermFreqAndPositions)
    n_blocks × block header (fixed 27 bytes → this IS the skip data):
        u64  last_doc_id  (inclusive; enables binary-search skipping)
        u32  d_off        (block's byte offset within the delta stream)
        u32  t_off        (block's byte offset within the tf stream)
        u16  n_docs       (<= BLOCK)
        u32  max_tf       (block-max impact bound input)
        u8   min_norm     (block-max impact bound input)
        u32  p_off        (block's byte offset within the position stream)
    delta stream  (VInt doc gaps; a term's first delta is the absolute doc id,
                   every later delta is doc[i] - doc[i-1], across block
                   boundaries too — so the whole stream is encodable in ONE
                   vectorized pass over a sorted group)
    tf stream     (VInt tf - 1)
    norm bytes    (raw u8, one per posting)
    position stream (VInt position gaps, tf values per posting; each
                   posting's first value is its absolute first position —
                   self-contained per posting, so segment merges concatenate
                   raw bytes without re-encoding. Laid out LAST so BM25
                   evaluation never touches it; only phrase queries pay.)

Scoring needs (tf, norm) per posting; storing the norm byte inline (as
Lucene's impact lists pair (freq, norm)) means query evaluation never
touches a doc-side norms table — essential at 10^12 docs where a global
norms array cannot be broadcast.

Both encode and decode are numpy-vectorized (no per-posting Python); the
group encoder ``encode_postings_group`` VInt-codes an entire shuffle group
(hundreds of thousands of postings) in one pass and only slices per term.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
_HEADER_DTYPE = np.dtype(
    [
        ("last_doc", "<u8"),
        ("d_off", "<u4"),
        ("t_off", "<u4"),
        ("n_docs", "<u2"),
        ("max_tf", "<u4"),
        ("min_norm", "u1"),
        ("p_off", "<u4"),
    ]
)
HEADER_BYTES = _HEADER_DTYPE.itemsize  # 27
_PRELUDE = 2 + 4 + 4 + 4  # u16 n_blocks, u32 d_len, u32 t_len, u32 p_len


def _varint_lengths(v: np.ndarray) -> np.ndarray:
    """ceil(bit_length/7) per value, min 1 — in ONE pass via the float64
    exponent (frexp is exact for integers < 2^53; phase B's encode is
    memory-bandwidth-bound on this box, and the old 9-compare loop made 9
    full passes over the array). Values ≥ 2^49 take a rare exact fixup."""
    f = v.astype(np.float64)
    bl = np.frexp(f)[1]  # == bit_length for exact conversions; 0 for v == 0
    nbytes = np.maximum(np.int64(1), (bl + 6) // 7).astype(np.int64)
    big = v >= np.uint64(1) << np.uint64(49)
    if big.any():
        vb = v[big]
        nb = np.ones(len(vb), dtype=np.int64)
        for k in range(1, 10):
            nb += (vb >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
        nbytes[big] = nb
    return nbytes


def _varint_fill(v: np.ndarray, nbytes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Write each value's LEB128 bytes at offsets[i]..offsets[i]+nbytes[i].

    Contiguous formulation: build an (n, max_bytes) matrix with plain
    full-array shifts (no masked scatters — those gather/scatter passes
    were the phase-B hotspot and collapse under memory-bus contention),
    clear the continuation bit on each value's terminal byte, then one
    row-major boolean select emits the stream in order."""
    n = len(v)
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    B = int(nbytes.max())
    mat = np.empty((B, n), dtype=np.uint8)  # level-major: each fill is contiguous
    cur = v.copy()
    for b in range(B):
        mat[b] = (cur.astype(np.uint8) & 0x7F) | 0x80
        cur >>= np.uint64(7)
    mat[nbytes - 1, np.arange(n)] &= 0x7F
    valid = np.arange(B, dtype=np.int64)[:, None] < nbytes[None, :]
    return mat.T[valid.T]


def varint_encode(vals: np.ndarray) -> np.ndarray:
    """LEB128-style VInt encode of a uint64 array -> uint8 array."""
    v = vals.astype(np.uint64, copy=False)
    nbytes = _varint_lengths(v)
    offsets = np.zeros(len(v) + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    return _varint_fill(v, nbytes, offsets)


def varint_decode(buf: np.ndarray, count: int) -> tuple[np.ndarray, int]:
    """Decode `count` VInts from a uint8 array; returns (values, bytes_used)."""
    if count == 0:
        return np.zeros(0, dtype=np.uint64), 0
    cont = (buf & 0x80) != 0
    ends = np.flatnonzero(~cont)
    if len(ends) < count:
        raise ValueError("varint stream truncated")
    ends = ends[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(count, dtype=np.uint64)
    for b in range(int(lengths.max())):
        m = lengths > b
        vals[m] |= (buf[starts[m] + b].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * b)
    return vals, int(ends[-1] + 1)


def encode_postings_group(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    pos_data: np.ndarray | None = None,
    pos_off: np.ndarray | None = None,
) -> list[bytes]:
    """Encode many terms' postings in ONE vectorized pass.

    ``doc_ids``/``tfs``/``norms`` are the whole group's columns sorted by
    (term, doc_id); ``starts``/``ends`` delimit each term's run. The VInt
    math runs once over the full arrays; the per-term Python work is six
    buffer slices + one join.

    ``pos_data``/``pos_off``: optional per-posting position payloads —
    ``pos_data`` is a uint8 array of already-VInt-gap-encoded positions in
    the SAME posting order (posting i's bytes are
    ``pos_data[pos_off[i]:pos_off[i+1]]``, ``len(pos_off) == n+1``).
    Because each posting's stream is self-contained, the encoder only
    slices — no re-encoding.
    """
    n = len(doc_ids)
    n_terms = len(starts)
    if n == 0:
        return []
    doc_ids = doc_ids.astype(np.int64, copy=False)
    tfs = tfs.astype(np.int64, copy=False)
    norms = norms.astype(np.uint8, copy=False)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)

    # global delta stream with a reset (absolute doc id) at each term start
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
    deltas[starts] = doc_ids[starts].astype(np.uint64)

    d_len = _varint_lengths(deltas)
    d_pos = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(d_len, out=d_pos[1:])
    d_stream = _varint_fill(deltas, d_len, d_pos)

    tvals = (tfs - 1).astype(np.uint64)
    t_len = _varint_lengths(tvals)
    t_pos = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(t_len, out=t_pos[1:])
    t_stream = _varint_fill(tvals, t_len, t_pos)

    # per-term block layout, all vectorized
    dfs = ends - starts
    nb = (dfs + BLOCK - 1) // BLOCK
    if nb.max(initial=0) > 0xFFFF:
        raise ValueError("term posting list too long for one part (use salting)")
    total_blocks = int(nb.sum())
    term_of_block = np.repeat(np.arange(n_terms, dtype=np.int64), nb)
    first_block = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(nb, out=first_block[1:])
    block_in_term = np.arange(total_blocks, dtype=np.int64) - first_block[:-1][term_of_block]
    bs = starts[term_of_block] + block_in_term * BLOCK  # block start posting
    be = np.minimum(bs + BLOCK, ends[term_of_block])  # block end posting

    headers = np.zeros(total_blocks, dtype=_HEADER_DTYPE)
    headers["last_doc"] = doc_ids[be - 1].astype(np.uint64)
    headers["d_off"] = (d_pos[bs] - d_pos[starts[term_of_block]]).astype(np.uint32)
    headers["t_off"] = (t_pos[bs] - t_pos[starts[term_of_block]]).astype(np.uint32)
    headers["n_docs"] = (be - bs).astype(np.uint16)
    # reduceat over global block starts (bs is ascending and covers [0, n))
    headers["max_tf"] = np.maximum.reduceat(tfs, bs).astype(np.uint32)
    headers["min_norm"] = np.minimum.reduceat(norms, bs)
    if pos_data is not None:
        pos_off = np.asarray(pos_off, dtype=np.int64)
        headers["p_off"] = (pos_off[bs] - pos_off[starts[term_of_block]]).astype(np.uint32)
        p_bytes = pos_data.tobytes() if isinstance(pos_data, np.ndarray) else bytes(pos_data)

    d_bytes = d_stream.tobytes()
    t_bytes = t_stream.tobytes()
    n_bytes = norms.tobytes()
    hdr_bytes = headers.tobytes()

    out: list[bytes] = []
    for i in range(n_terms):
        s, e = starts[i], ends[i]
        dl = int(d_pos[e] - d_pos[s])
        tl = int(t_pos[e] - t_pos[s])
        pl = int(pos_off[e] - pos_off[s]) if pos_data is not None else 0
        prelude = (
            int(nb[i]).to_bytes(2, "little")
            + dl.to_bytes(4, "little")
            + tl.to_bytes(4, "little")
            + pl.to_bytes(4, "little")
        )
        payload = (
            prelude
            + hdr_bytes[first_block[i] * HEADER_BYTES : first_block[i + 1] * HEADER_BYTES]
            + d_bytes[d_pos[s] : d_pos[e]]
            + t_bytes[t_pos[s] : t_pos[e]]
            + n_bytes[s:e]
        )
        if pos_data is not None:
            payload += p_bytes[pos_off[s] : pos_off[e]]
        out.append(payload)
    return out


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    pos_data: np.ndarray | None = None,
    pos_off: np.ndarray | None = None,
) -> bytes:
    """Encode one term's postings (doc-id ascending) into the block layout."""
    n = len(doc_ids)
    assert n > 0
    return encode_postings_group(
        np.asarray(doc_ids),
        np.asarray(tfs),
        np.asarray(norms),
        np.array([0], dtype=np.int64),
        np.array([n], dtype=np.int64),
        pos_data=pos_data,
        pos_off=pos_off,
    )[0]


def encode_position_gaps(positions: np.ndarray, run_starts: np.ndarray) -> np.ndarray:
    """Gap+VInt encode a flat positions array with per-posting resets.

    ``positions`` is the concatenation of every posting's ascending position
    list; ``run_starts`` marks each posting's first slot. Returns the uint8
    stream; per-value byte lengths come from ``position_value_lengths``."""
    p = positions.astype(np.int64, copy=False)
    gaps = np.empty(len(p), dtype=np.uint64)
    if len(p):
        gaps[0] = p[0]
        gaps[1:] = (p[1:] - p[:-1]).astype(np.uint64)
        gaps[run_starts] = p[run_starts].astype(np.uint64)
    return varint_encode(gaps)


def decode_position_stream(buf: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Inverse of ``encode_position_gaps``: decode ``sum(tfs)`` VInt gaps
    and rebuild absolute positions with a reset at each posting's first
    value. Vectorized (cumsum + per-run adjustment)."""
    total = int(tfs.sum())
    gaps, _ = varint_decode(buf, total)
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    run_starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=run_starts[1:])
    C = np.cumsum(gaps.astype(np.int64))
    Cext = np.concatenate([[0], C])
    # subtract, for every slot, the cumulative sum at its run's start so
    # each posting's positions restart from its absolute first value
    adj = np.repeat(Cext[run_starts], tfs.astype(np.int64))
    return C - adj


class PostingsView:
    """Lazy decoded view over one term's encoded payload.

    Exposes the skip data (block headers) without decoding posting data;
    blocks decode on demand — the query engine's block-max pruning reads
    headers only for skipped ranges.
    """

    __slots__ = ("buf", "headers", "d_base", "t_base", "n_base", "p_base", "p_len", "n_off", "_cache")

    def __init__(self, payload: memoryview | bytes):
        buf = np.frombuffer(payload, dtype=np.uint8)
        n_blocks = int(np.frombuffer(payload[:2], dtype="<u2")[0])
        d_len = int(np.frombuffer(payload[2:6], dtype="<u4")[0])
        t_len = int(np.frombuffer(payload[6:10], dtype="<u4")[0])
        p_len = int(np.frombuffer(payload[10:14], dtype="<u4")[0])
        self.headers = np.frombuffer(
            payload[_PRELUDE : _PRELUDE + n_blocks * HEADER_BYTES], dtype=_HEADER_DTYPE
        )
        self.d_base = _PRELUDE + n_blocks * HEADER_BYTES
        self.t_base = self.d_base + d_len
        self.n_base = self.t_base + t_len
        n_off = np.zeros(n_blocks + 1, dtype=np.int64)
        np.cumsum(self.headers["n_docs"].astype(np.int64), out=n_off[1:])
        self.n_off = n_off
        self.p_base = self.n_base + int(n_off[-1])
        self.p_len = p_len
        self.buf = buf
        self._cache: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    @property
    def has_positions(self) -> bool:
        return self.p_len > 0

    @property
    def n_blocks(self) -> int:
        return len(self.headers)

    @property
    def doc_freq(self) -> int:
        return int(self.n_off[-1])

    def decode_block(self, bi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (doc_ids int64, tfs int64, norms uint8) for block bi."""
        hit = self._cache.get(bi)
        if hit is not None:
            return hit
        h = self.headers[bi]
        nd = int(h["n_docs"])
        d_start = self.d_base + int(h["d_off"])
        t_start = self.t_base + int(h["t_off"])
        deltas, _ = varint_decode(self.buf[d_start:], nd)
        tfs, _ = varint_decode(self.buf[t_start:], nd)
        n_start = self.n_base + int(self.n_off[bi])
        norms = self.buf[n_start : n_start + nd].copy()
        docs = np.cumsum(deltas.astype(np.int64))
        if bi > 0:
            docs += int(self.headers[bi - 1]["last_doc"])
        out = (docs, tfs.astype(np.int64) + 1, norms)
        self._cache[bi] = out
        return out

    def decode_blocks(self, bis: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode MANY blocks with two vectorized varint passes.

        ``bis`` must be sorted ascending, unique. Returns (docs int64,
        tfs int64, norms uint8) concatenated in block order — the batch
        primitive behind block-max evaluation (one call per term per round
        instead of one Python iteration per block)."""
        n_sel = len(bis)
        if n_sel == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), np.zeros(0, dtype=np.uint8)
        h = self.headers
        nd = h["n_docs"][bis].astype(np.int64)
        total = int(nd.sum())
        d_off = h["d_off"].astype(np.int64)
        t_off = h["t_off"].astype(np.int64)
        d_len_total = self.t_base - self.d_base
        t_len_total = self.n_base - self.t_base
        d_ends = np.concatenate([d_off[1:], [d_len_total]])
        t_ends = np.concatenate([t_off[1:], [t_len_total]])
        dbuf = np.concatenate(
            [self.buf[self.d_base + d_off[b] : self.d_base + d_ends[b]] for b in bis]
        )
        tbuf = np.concatenate(
            [self.buf[self.t_base + t_off[b] : self.t_base + t_ends[b]] for b in bis]
        )
        deltas, _ = varint_decode(dbuf, total)
        tfs, _ = varint_decode(tbuf, total)
        norms = np.concatenate(
            [self.buf[self.n_base + self.n_off[b] : self.n_base + self.n_off[b + 1]] for b in bis]
        ).copy()
        # docs: per block, base(prev block's last_doc, 0 for block 0) + cumsum
        starts = np.zeros(n_sel, dtype=np.int64)
        np.cumsum(nd[:-1], out=starts[1:])
        C = np.cumsum(deltas.astype(np.int64))
        Cext = np.concatenate([[0], C])
        base_prev = np.where(bis > 0, h["last_doc"][np.maximum(bis - 1, 0)].astype(np.int64), 0)
        adj = np.repeat(base_prev - Cext[starts], nd)
        docs = C + adj
        return docs, tfs.astype(np.int64) + 1, norms

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self.decode_blocks(np.arange(self.n_blocks, dtype=np.int64))

    # -- positions ----------------------------------------------------------

    def decode_blocks_positions(self, bis: np.ndarray, tfs: np.ndarray) -> np.ndarray:
        """Flat absolute positions for the selected blocks.

        ``bis`` sorted unique; ``tfs`` must be the tf array returned by
        ``decode_blocks(bis)`` (per-posting value counts). The result aligns
        with ``np.repeat(docs, tfs)``. Only phrase/span evaluation pays this
        cost — the position stream is never touched by BM25 scoring."""
        if not self.has_positions:
            raise ValueError("segment was built without positions")
        if len(bis) == 0:
            return np.zeros(0, dtype=np.int64)
        h = self.headers
        p_off = h["p_off"].astype(np.int64)
        p_ends = np.concatenate([p_off[1:], [self.p_len]])
        pbuf = np.concatenate(
            [self.buf[self.p_base + p_off[b] : self.p_base + p_ends[b]] for b in bis]
        )
        return decode_position_stream(pbuf, tfs.astype(np.int64))

    def positions_raw(self, tfs: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
        """(pos_stream uint8, per-posting byte offsets int64 [n+1]) — the raw
        self-contained per-posting position payloads, for zero-re-encode
        merging. ``tfs`` (all postings' tf, in order) is decoded if absent."""
        if not self.has_positions:
            raise ValueError("segment was built without positions")
        if tfs is None:
            tfs = self.decode_all()[1]
        data = self.buf[self.p_base : self.p_base + self.p_len]
        # VInt value boundaries = bytes with the continuation bit clear;
        # posting i's payload ends after its cumulative tf-th value
        value_ends = np.flatnonzero((data & 0x80) == 0)
        last_value = np.cumsum(tfs.astype(np.int64)) - 1
        off = np.zeros(len(tfs) + 1, dtype=np.int64)
        if len(tfs):
            off[1:] = value_ends[last_value] + 1
        return data, off
