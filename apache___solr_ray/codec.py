"""Posting-list codec: delta + VInt compression with block-max skip metadata.

Rebuilds the role of Lucene's postings format (doc-delta VInt within 128-doc
blocks, per-block skip/impact ("block-max") data — [Lucene 10.4 library]
semantics, configured by the reference at
``solr/core/src/java/org/apache/solr/update/SolrIndexConfig.java:242-289``)
as a simple, numpy-codable layout:

Per-term payload::

    [u16 n_blocks]
    n_blocks × block header (fixed 19 bytes → this IS the skip data):
        u64  last_doc_id      (inclusive; enables binary-search skipping)
        u32  data_offset      (relative to start of block-data section)
        u16  n_docs           (<= BLOCK)
        u32  max_tf           (block-max impact bound input)
        u8   min_norm         (block-max impact bound input)
    block data, per block:
        VInt doc deltas  (first delta relative to previous block's last_doc,
                          or to -1 for the first block)
        VInt (tf - 1)
        raw  u8 norms    (n_docs bytes)

Scoring needs (tf, norm) per posting; storing the norm byte inline (as
Lucene's impact lists pair (freq, norm)) means query evaluation never
touches a doc-side norms table — essential at 10^12 docs where a global
norms array cannot be broadcast.

Both encode and decode are numpy-vectorized (no per-posting Python).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
_HEADER_DTYPE = np.dtype(
    [
        ("last_doc", "<u8"),
        ("data_off", "<u4"),
        ("n_docs", "<u2"),
        ("max_tf", "<u4"),
        ("min_norm", "u1"),
    ]
)
HEADER_BYTES = _HEADER_DTYPE.itemsize  # 19


def varint_encode(vals: np.ndarray) -> np.ndarray:
    """LEB128-style VInt encode of a uint64 array -> uint8 array."""
    v = vals.astype(np.uint64, copy=True)
    nbytes = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    offsets = np.zeros(len(v) + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    cur = v.copy()
    for b in range(int(nbytes.max()) if len(v) else 0):
        active = nbytes > b
        idx = offsets[:-1][active] + b
        byte = (cur[active] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[active] > b + 1).astype(np.uint8) << 7
        out[idx] = byte | more
        cur[active] >>= np.uint64(7)
    return out


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


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, norms: np.ndarray) -> bytes:
    """Encode one term's postings (doc-id ascending) into the block layout."""
    n = len(doc_ids)
    assert n > 0
    n_blocks = (n + BLOCK - 1) // BLOCK
    if n_blocks > 0xFFFF:
        raise ValueError("term posting list too long for one part (use salting)")
    doc_ids = doc_ids.astype(np.int64)
    # deltas: within the full stream, first delta relative to -1 is doc+1?
    # Convention: first block's first delta = doc_ids[0]; later blocks' first
    # delta = doc - prev_block_last (>=1). Within block: plain gaps.
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)

    headers = np.zeros(n_blocks, dtype=_HEADER_DTYPE)
    datas: list[np.ndarray] = []
    off = 0
    for bi in range(n_blocks):
        lo, hi = bi * BLOCK, min(n, (bi + 1) * BLOCK)
        d = varint_encode(deltas[lo:hi])
        t = varint_encode((tfs[lo:hi] - 1).astype(np.uint64))
        nb = norms[lo:hi].astype(np.uint8)
        headers[bi]["last_doc"] = doc_ids[hi - 1]
        headers[bi]["data_off"] = off
        headers[bi]["n_docs"] = hi - lo
        headers[bi]["max_tf"] = int(tfs[lo:hi].max())
        headers[bi]["min_norm"] = int(nb.min())
        datas.extend((d, t, nb))
        off += len(d) + len(t) + len(nb)
    count = np.uint16(n_blocks).tobytes()
    return count + headers.tobytes() + b"".join(x.tobytes() for x in datas)


class PostingsView:
    """Lazy decoded view over one term's encoded payload.

    Exposes the skip data (block headers) without decoding posting data;
    blocks decode on demand — the query engine's block-max pruning reads
    headers only for skipped ranges.
    """

    __slots__ = ("buf", "headers", "data_base", "_cache")

    def __init__(self, payload: memoryview | bytes):
        buf = np.frombuffer(payload, dtype=np.uint8)
        n_blocks = int(np.frombuffer(payload[:2], dtype="<u2")[0])
        self.headers = np.frombuffer(payload[2 : 2 + n_blocks * HEADER_BYTES], dtype=_HEADER_DTYPE)
        self.data_base = 2 + n_blocks * HEADER_BYTES
        self.buf = buf
        self._cache: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    @property
    def n_blocks(self) -> int:
        return len(self.headers)

    @property
    def doc_freq(self) -> int:
        return int(self.headers["n_docs"].sum())

    def decode_block(self, bi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (doc_ids int64, tfs int64, norms uint8) for block bi."""
        hit = self._cache.get(bi)
        if hit is not None:
            return hit
        h = self.headers[bi]
        nd = int(h["n_docs"])
        start = self.data_base + int(h["data_off"])
        sl = self.buf[start:]
        deltas, used = varint_decode(sl, nd)
        tfs, used2 = varint_decode(sl[used:], nd)
        norms = sl[used + used2 : used + used2 + nd].copy()
        docs = np.cumsum(deltas.astype(np.int64))
        if bi > 0:
            docs += int(self.headers[bi - 1]["last_doc"])
        out = (docs, tfs.astype(np.int64) + 1, norms)
        self._cache[bi] = out
        return out

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        parts = [self.decode_block(bi) for bi in range(self.n_blocks)]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )
