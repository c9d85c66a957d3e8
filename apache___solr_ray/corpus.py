"""Deterministic synthetic Common-Crawl-style pages corpus.

Generates the exact ``input_hint`` table shape from BASELINE.json —
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
— fully deterministically (row i depends only on (seed, i)), so tests,
the DuckDB oracle and both bench parallelism levels see identical bytes.

Corpus properties (FIXTURES.md §1, modeled on the reference's JMH doc
generators ``solr/benchmark/.../index/CloudIndexing.java:78-94`` but
specialized to web text):

- Zipfian vocabulary (~30k distinct stems incl. very-high-df head terms —
  the reference's default stopword list is empty, so head terms stay
  indexed and create the term-skew the build must handle),
- doc length ~ clipped lognormal (20..2000 tokens),
- mixed case (capitalized/UPPER variants hit the LowerCaseFilter),
- punctuation + special tokens (domains, emails, numbers, hyphenations,
  apostrophes) exercising the UAX#29-ish tokenizer,
- ~2% exact-duplicate ``text`` under distinct ``url`` (dedup tests),
- ``html`` wraps ``text`` via ``extract.render_html`` such that
  ``extract(html) == text`` byte-identically per url.

Generation is chunk-deterministic: rows are produced in fixed chunks of
``CHUNK`` ids, each chunk from its own PCG64 stream seeded by (seed, chunk).
Any id range can be generated independently — this is what makes the corpus
writable in parallel by Ray tasks with no coordination.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from apache___solr_ray.extract import render_html

CHUNK = 8192
VOCAB_SIZE = 30_000
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"

_SPECIAL = [
    "example.com", "sub.domain.example.org", "user.name", "don't", "it's",
    "o'brien", "3.14", "1,000", "v2", "state-of-the-art", "re-index",
    "http", "https", "utf-8", "ID_42", "foo_bar", "x86_64", "2026",
]


def _word(i: int) -> str:
    # deterministic pseudo-word from an integer: 2-5 CV syllables
    h = (i * 2654435761) & 0xFFFFFFFF
    n_syll = 2 + (h % 4)
    out = []
    for s in range(n_syll):
        h = (h * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append(_CONS[(h >> 5) % len(_CONS)])
        out.append(_VOW[(h >> 17) % len(_VOW)])
        if (h >> 29) % 3 == 0:
            out.append(_CONS[(h >> 37) % len(_CONS)])
    return "".join(out)


def _build_vocab() -> np.ndarray:
    """3 case-variants per term: [lower, Capitalized, UPPER]."""
    seen: dict[str, None] = {}
    i = 0
    while len(seen) < VOCAB_SIZE:
        w = _word(i)
        if w not in seen:
            seen[w] = None
        i += 1
    base = list(seen)
    # splice special tokens into mid-frequency ranks (deterministic spots)
    for j, sp in enumerate(_SPECIAL):
        base[200 + j * 53] = sp
    out = np.empty(len(base) * 3, dtype=object)
    out[0::3] = base
    out[1::3] = [w[:1].upper() + w[1:] for w in base]
    out[2::3] = [w.upper() for w in base]
    return out


_VOCAB: np.ndarray | None = None
_ZIPF_CDF: np.ndarray | None = None


def _vocab_and_cdf() -> tuple[np.ndarray, np.ndarray]:
    global _VOCAB, _ZIPF_CDF
    if _VOCAB is None:
        _VOCAB = _build_vocab()
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = 1.0 / (ranks + 2.7) ** 1.07  # classic Zipf-Mandelbrot web-text fit
        p /= p.sum()
        _ZIPF_CDF = np.cumsum(p)
    return _VOCAB, _ZIPF_CDF


def _gen_chunk(seed: int, chunk_id: int) -> dict[str, np.ndarray | list]:
    """Generate ALL rows of one chunk (ids [chunk_id*CHUNK, +CHUNK)).

    Always full-size: row content must depend only on (seed, row id), never
    on how much of the chunk a caller asked for (the RNG consumption would
    otherwise differ between callers).
    """
    n = CHUNK
    vocab, cdf = _vocab_and_cdf()
    rng = np.random.Generator(np.random.PCG64([seed, chunk_id]))
    ids = chunk_id * CHUNK + np.arange(n, dtype=np.int64)

    # doc lengths: clipped lognormal, 20..2000 tokens
    doc_len = np.clip(np.exp(rng.normal(4.55, 0.65, n)), 20, 2000).astype(np.int64)
    total = int(doc_len.sum())
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(doc_len, out=offsets[1:])

    # Zipf-sample term ranks; choose case variant; occasional punctuation
    u = rng.random(total)
    rank = np.searchsorted(cdf, u, side="left")
    form = np.zeros(total, dtype=np.int64)
    uf = rng.random(total)
    form[uf < 0.08] = 1   # Capitalized
    form[uf < 0.015] = 2  # UPPER
    words = vocab[rank * 3 + form]
    punct = rng.random(total)
    # ~8% trailing '.', ~4% trailing ','  (splits under the tokenizer)
    wl = words.tolist()
    for idx in np.flatnonzero(punct < 0.08):
        wl[idx] = wl[idx] + "."
    for idx in np.flatnonzero((punct >= 0.08) & (punct < 0.12)):
        wl[idx] = wl[idx] + ","
    flat = pa.array(wl, type=pa.string())
    texts_arr = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32() if total < 2**31 else pa.int64()), flat),
        " ",
    )
    texts = texts_arr.to_pylist()

    # ~2% exact duplicates (distinct url, identical text), within-chunk source
    for li in range(7, n, 50):
        if li > 0:
            texts[li] = texts[(li * 31) % li]

    urls = [f"https://site{(i * 7919) % 997}.example/p/{i:012d}" for i in ids]
    ts = EPOCH_US + (ids * 7_919_017) % (30 * 86_400 * 1_000_000)
    lang_pick = (ids * 104_729) % 100
    lang_cycle = ["de", "fr", "es", "zh", "pt"]
    langs = ["en" if lp < 95 else lang_cycle[int(lp) % 5] for lp in lang_pick]
    # html is rendered lazily per requested slice (it is the expensive part)
    return {"url": urls, "warc_ts": ts, "text": texts, "lang": langs}


_CHUNK_CACHE: dict[tuple[int, int], dict] = {}


def _chunk(seed: int, chunk_id: int) -> dict:
    key = (seed, chunk_id)
    hit = _CHUNK_CACHE.get(key)
    if hit is None:
        if len(_CHUNK_CACHE) > 2:
            _CHUNK_CACHE.clear()
        hit = _CHUNK_CACHE[key] = _gen_chunk(seed, chunk_id)
    return hit


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_table(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Materialize rows [start, start+n_docs) as one Arrow table."""
    cols: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    i = start
    end = start + n_docs
    while i < end:
        cid = i // CHUNK
        cstart = cid * CHUNK
        d = _chunk(seed, cid)
        lo, hi = i - cstart, min(CHUNK, end - cstart)
        for k in ("url", "warc_ts", "text", "lang"):
            v = d[k]
            cols[k].extend(v[lo:hi] if isinstance(v, list) else list(v[lo:hi]))
        ids = range(cstart + lo, cstart + hi)
        cols["html"].extend(
            render_html(t, seed=rid).encode("utf-8")
            for t, rid in zip(d["text"][lo:hi], ids)
        )
        i = cstart + hi
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(np.asarray(cols["warc_ts"], dtype=np.int64)).cast(pa.timestamp("us")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        }
    )


def write_pages(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    rows_per_file: int = 4 * CHUNK,
    row_group_size: int = 2048,
) -> list[str]:
    """Write the corpus as a directory of Parquet part files (idempotent).

    One file per id range — the resumable-output layout (a rerun skips files
    that already exist with the right footer row count). Small row groups
    (``row_group_size``) are what lets ``build.plan_partitions`` split a file
    into many phase-A tasks — row-group granularity is the unit of build
    parallelism, like the reference's per-shard doc routing
    (solr/solrj/src/java/org/apache/solr/common/cloud/DocRouter.java:170-183).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, n_docs, rows_per_file):
        n = min(rows_per_file, n_docs - start)
        path = os.path.join(out_dir, f"pages-{start:012d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            try:
                if pq.ParquetFile(path).metadata.num_rows == n:
                    continue
            except Exception:
                pass
        tmp = path + ".tmp"
        pq.write_table(pages_table(n, seed=seed, start=start), tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
    return paths


def write_pages_parallel(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    rows_per_file: int = 4 * CHUNK,
    row_group_size: int = 2048,
) -> list[str]:
    """Parallel (Ray tasks) corpus writer — same layout/bytes as write_pages.

    Each file's rows depend only on (seed, id range), so tasks need no
    coordination; a rerun skips complete files (resumable output).
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def _one(start: int) -> str:
        n = min(rows_per_file, n_docs - start)
        path = os.path.join(out_dir, f"pages-{start:012d}.parquet")
        if os.path.exists(path):
            try:
                if pq.ParquetFile(path).metadata.num_rows == n:
                    return path
            except Exception:
                pass
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(pages_table(n, seed=seed, start=start), tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
        return path

    return sorted(ray.get([_one.remote(s) for s in range(0, n_docs, rows_per_file)]))
