"""The distributed index build — a Ray Data pipeline.

Ray-native restatement of the reference indexing path (SURVEY §3.1:
``/update`` → URP chain → analysis → IndexWriter RAM buffer → flushed
segments → merge), re-planned for batch Parquet input:

Phase A  (per doc-partition; Dataset of partition descriptors →
``map_batches`` tasks, one per partition):
    stream the partition's row groups → HTML→text extract → analyze
    (tokenize/lower/stop) → assign dense doc ids → write
    ``docs/part-*.parquet`` (url, doc_id, doc_len, norm, lang),
    ``postings_raw/part-*.parquet`` (term, doc_id, tf, norm) and
    ``termdf/part-*.parquet`` (term, df partial), plus a lineage manifest.
    A partition whose manifest matches its input fingerprint is skipped on
    resume — the "no re-tokenizing completed partitions" checkpoint; the
    persisted postings_raw is the Lucene flushed-segment analog.

Phase B  (the term-hash shuffle) — two interchangeable physical plans:

``shuffle="storage"`` (default; the external/map-side shuffle): phase A
    already wrote each part's postings SORTED by tkey with Parquet
    row-group boundaries aligned to tkey runs, and recorded the
    (row-group, n_rows) map per tkey in its lineage manifest. Phase B is
    then an embarrassingly parallel stage: one task per (tkey, salt)
    reads exactly its bucket's row groups from every part file (column
    pruning + row-group pruning — no object-store all-to-all at all)
    and encodes one segment. Skew handling is uniform *doc-range
    splitting*: a bucket whose total postings exceed
    ``max_postings_per_segment`` is split into contiguous part-range
    chunks (salt = chunk index) — sub-segments stay doc-ordered, so
    query-side views concatenate for free. This is the plan that holds
    at 10^12 docs: shuffle bytes ride the shared filesystem, not RAM.

``shuffle="ray"`` (the object-store all-to-all): a tiny
    ``groupby(term).sum(df)`` over the termdf partials finds head terms
    (global df > salt_threshold); ``read_parquet(postings_raw)`` →
    ``map_batches`` stamps ``skey = tkey * (P+1) + salt`` (salt = doc
    partition + 1 for head terms — giant groups split into doc-ordered
    sub-lists; SURVEY §4 "skew") → ``groupby(skey).map_groups`` encodes
    each group into a segment. Idiomatic Ray Data; best when the
    cluster has no shared filesystem for intermediates.

Commit: ``stats.json`` (docCount, sumTotalTermFreq — the ExactStatsCache
global stats, reference ``CollectionStats.java:24-27``) and an atomic
``index_manifest.json`` (the segments_N pointer-swap analog).

Doc-id assignment: ``doc_id = part_id << 32 | row_in_partition`` where
partitions are deterministic (sorted file paths × row-group ranges). Unlike
the reference's murmur3 HTTP routing (``HashBasedRouter.java:28-62``), a
batch build reads immutable files, so arrival order IS a stable identity —
no doc shuffle is needed at all, which removes the largest all-to-all
exchange from the job. Scores never depend on placement, only tie-break
order does, and that is fixed by the deterministic partition plan.
"""

from __future__ import annotations

import hashlib
import os
import time
import pyarrow.compute as pc
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from apache___solr_ray.analyze import Analyzer
from apache___solr_ray.extract import extract_batch
from apache___solr_ray.lucene import int_to_byte4_array
from apache___solr_ray.manifest import (
    input_fingerprint,
    is_valid,
    read_json,
    write_json_atomic,
)
from apache___solr_ray.segment import build_segment_from_group

HASH_KEY = "0123456789abcdef"  # fixed key for pd.util.hash_array (determinism)


def _limit_threads() -> None:
    """Pin Arrow's internal pools to the task's 1-CPU allocation.

    Arrow defaults its compute/IO pools to the MACHINE core count, so every
    Ray task would silently oversubscribe (and the 8-CPU scaling level would
    borrow all 32 cores) — parallelism must come from Ray's scheduler only.
    """
    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)


@dataclass(frozen=True)
class FieldSpec:
    """One indexed field of the schema (reference: IndexSchema.java field
    declarations + FieldProperties). ``source`` is the corpus column the
    field's text comes from; ``copy_sources`` (copyField analog,
    DocumentBuilder.java:183-230) makes this field index the concatenation
    of OTHER fields' source text instead — token positions continue across
    the copied sources (posIncrementGap=0, documented divergence from
    Solr's default 100 for multivalued fields)."""

    name: str
    source: str = ""                      # corpus column; "" -> copy-only field
    copy_sources: tuple[str, ...] = ()    # field NAMES whose text fans in

    def key(self) -> str:
        return f"{self.name}<{self.source}|{','.join(self.copy_sources)}"


@dataclass(frozen=True)
class IndexConfig:
    """Build configuration (the solrconfig.xml/schema analog)."""

    term_partitions: int = 32          # T: term-hash shuffle width
    salt_threshold: int = 2_000_000    # global df above which a term is salted ("ray" plan)
    target_docs_per_part: int = 65_536  # phase-A doc-partition size
    read_batch_rows: int = 2_048       # streamed read batch (html rows are wide)
    stopwords: frozenset[str] = field(default_factory=frozenset)
    text_from_html: bool = True        # extract text from html (the real path)
    shuffle: str = "storage"           # "storage" (external shuffle) | "ray" (object-store)
    max_postings_per_segment: int = 16_000_000  # doc-range split threshold ("storage" plan)
    #: index token positions (Lucene text-field default; enables phrase
    #: queries). Off = omitTermFreqAndPositions-style slimmer postings.
    store_positions: bool = True
    #: multi-field schema (IndexSchema analog). Empty = the single implicit
    #: ``text`` field (from html or the text column per text_from_html).
    #: Non-empty: each field's terms are keyed ``<field>:<term>`` in the
    #: shared term space (the term dict sorts by (field, term), as Lucene's
    #: per-field terms do) with per-field collection stats for BM25.
    fields: tuple[FieldSpec, ...] = ()
    #: index-time sort (Lucene IndexSorter / <indexSort> analog): rows of
    #: each doc partition are sorted by this numeric corpus column before
    #: doc-id assignment, per-part (min,max) ranges land in the manifest,
    #: and sorted top-k queries early-terminate at part granularity
    #: (IndexReader.sorted_topk). Requires materializing one partition per
    #: task (the Lucene flush-time sort) — size target_docs_per_part to the
    #: worker heap when rows are wide.
    sort_field: str | None = None
    sort_desc: bool = True

    def fingerprint(self) -> str:
        return (
            f"T={self.term_partitions};salt={self.salt_threshold};"
            f"part={self.target_docs_per_part};stop={sorted(self.stopwords)};"
            f"html={self.text_from_html};pos={int(self.store_positions)};"
            f"flds=[{';'.join(f.key() for f in self.fields)}];fmt=7"
            + (f";sort={self.sort_field}:{int(self.sort_desc)}" if self.sort_field else "")
        )

    def fingerprint_full(self) -> str:
        """Adds phase-B-only knobs — used by the committed index manifest
        (segment layout), while per-part manifests use ``fingerprint()`` so
        phase-A outputs survive a phase-B reconfiguration."""
        return f"{self.fingerprint()};shuf={self.shuffle};maxpost={self.max_postings_per_segment}"


def _schema_columns(cfg: IndexConfig) -> list[str]:
    """Corpus columns phase A must read for the configured schema."""
    extra = [cfg.sort_field] if cfg.sort_field else []
    if not cfg.fields:
        base = ["url", "lang", "html"] if cfg.text_from_html else ["url", "lang", "text"]
        return base + extra
    cols = {"url", "lang"}
    cols.update(fs.source for fs in cfg.fields if fs.source)
    cols.update(extra)
    return sorted(cols)


def _field_texts(tbl: pa.Table, cfg: IndexConfig) -> list[tuple[str, pa.Array]]:
    """Resolve each schema field's text for one batch — the DocumentBuilder
    copyField fan-in (reference DocumentBuilder.java:183-230). Returns
    ``[(field_name, string_array)]``; the default schema is one unnamed
    field (terms stay unprefixed, byte-compatible with single-field
    indexes). A source column named ``html`` goes through the HTML→text
    extractor; any other source is read as a string column."""
    if not cfg.fields:
        if cfg.text_from_html:
            return [("", extract_batch(tbl.column("html")))]
        return [("", tbl.column("text").combine_chunks())]
    resolved: dict[str, pa.Array] = {}
    for fs in cfg.fields:
        if not fs.source:
            continue
        col = tbl.column(fs.source)
        if fs.source == "html":
            resolved[fs.name] = extract_batch(col)
        else:
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if not pa.types.is_string(arr.type):
                arr = pc.cast(arr, pa.string())
            resolved[fs.name] = arr
    out: list[tuple[str, pa.Array]] = []
    for fs in cfg.fields:
        txt = resolved.get(fs.name)
        if fs.copy_sources:
            pieces = ([txt] if txt is not None else []) + [
                resolved[s] for s in fs.copy_sources
            ]
            txt = (
                pc.binary_join_element_wise(*pieces, " ")
                if len(pieces) > 1
                else pieces[0]
            )
        if txt is None:
            raise ValueError(f"field {fs.name!r} has no source and no copy_sources")
        out.append((fs.name, txt))
    return out


def term_hash(terms: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of term strings.

    pandas' hash_array with a fixed key — vectorized, stable across runs and
    processes. (The reference's router murmur3 is provided in lucene.py for
    parity; the choice of hash affects only placement, never scores.)
    """
    return pd.util.hash_array(np.asarray(terms, dtype=object), hash_key=HASH_KEY, categorize=False)


def plan_partitions(paths: list[str], target_docs: int) -> list[dict]:
    """Deterministic partition plan: sorted files × row-group ranges."""
    parts = []
    pid = 0
    for path in sorted(paths):
        md = pq.ParquetFile(path).metadata
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        start = 0
        while start < len(rg_rows):
            end, rows = start, 0
            while end < len(rg_rows) and (rows == 0 or rows + rg_rows[end] <= target_docs):
                rows += rg_rows[end]
                end += 1
            parts.append(
                {
                    "part_id": pid,
                    "path": path,
                    "rg_start": start,
                    "rg_end": end,
                    "n_rows": rows,
                    "fingerprint": input_fingerprint(path, start, end, rows),
                }
            )
            pid += 1
            start = end
    if len(parts) >= 1 << 20:
        raise ValueError("too many partitions for 32-bit local doc ids")
    return parts


def _paths_of(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, (list, tuple)):
        return sorted(input_path)
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    return [input_path]


# ---------------------------------------------------------------------------
# Phase A
# ---------------------------------------------------------------------------


def _process_partition(desc: dict, index_dir: str, cfg: IndexConfig) -> dict:
    _limit_threads()
    part_id = int(desc["part_id"])
    man_path = os.path.join(index_dir, "manifests", f"part-{part_id:06d}.json")
    # fingerprint covers input slice AND build config: a config change (e.g.
    # term_partitions, which bakes tkey into postings_raw) invalidates parts
    part_fp = f"{desc['fingerprint']}|{cfg.fingerprint()}"
    existing = is_valid(man_path, part_fp)
    if existing is not None:
        existing["resumed"] = True
        return existing

    t0 = time.time()
    analyzer = Analyzer(stopwords=cfg.stopwords)
    pf = pq.ParquetFile(desc["path"])
    columns = _schema_columns(cfg)

    post_path = os.path.join(index_dir, "postings_raw", f"part-{part_id:06d}.parquet")
    os.makedirs(os.path.dirname(post_path), exist_ok=True)
    # Narrow shuffle payload (the phase-B byte diet — phase B is memory/
    # disk-bandwidth-bound, so shuffle bytes ARE reduce-side wall time):
    # - doc ids are stored as the 4-byte local row (doc_id = part_id << 32
    #   | row is reconstructed by the reduce side); the constant ``part``
    #   column RLE-compresses to nothing;
    # - terms stay dictionary-coded strings: measured against both a
    #   part-local int-code + vocab-sidecar layout (1.14 B codes + 0.53 B
    #   vocab) and a (term, row)-sorted delta layout (0.18 B codes but row
    #   gaps inflate to 1.23 B), Parquet's per-row-group dictionary pages
    #   + RLE indices are the SMALLEST encoding of the (term, doc)
    #   identity (1.41 B/posting ≈ its entropy on this corpus) — the
    #   information just moves between columns in the alternatives;
    # - ``norm`` is NOT shipped per posting (0.77 B/posting saved): it is
    #   a per-(field, doc) value, so the reduce side derives it from the
    #   docs sidecar (norm columns, n_docs rows ≪ n_postings) via
    #   norms[field_of(term), row];
    # - tkey is precomputed so the phase-B shuffle never hashes a term.
    post_fields = [
        ("term", pa.string()),
        ("row", pa.int32()),
        ("tf", pa.int32()),
        ("tkey", pa.int32()),
        ("part", pa.int32()),
    ]
    if cfg.store_positions:
        # per-posting VInt position payload (self-contained gap stream) —
        # opaque bytes from here to the segment encoder
        post_fields.append(("pos", pa.binary()))
    post_schema = pa.schema(post_fields)
    post_batches: list[pa.Table] = []

    urls: list[pa.Array] = []
    langs: list[pa.Array] = []
    lens: list[np.ndarray] = []
    df_partials: list[pa.Table] = []
    # per-field collection stats (Lucene CollectionStatistics per field:
    # docCount = docs with ≥1 token in the field, sumTotalTermFreq)
    f_sum_len: dict[str, int] = {fs.name: 0 for fs in cfg.fields}
    f_doc_count: dict[str, int] = {fs.name: 0 for fs in cfg.fields}
    row_base = 0
    n_postings = 0
    svals: list[np.ndarray] = []
    # per-named-field doc lengths (per-field norms ride the docs sidecar)
    flen_acc: dict[str, list[np.ndarray]] = {fs.name: [] for fs in cfg.fields}

    def _batches():
        it = pf.iter_batches(
            batch_size=cfg.read_batch_rows,
            row_groups=range(desc["rg_start"], desc["rg_end"]),
            columns=columns,
        )
        if not cfg.sort_field:
            for b in it:
                yield pa.Table.from_batches([b])
            return
        # index-time sort (Lucene flush-time IndexSorter): materialize THIS
        # partition, order rows by (sort_field, url) so doc ids ascend in
        # sort order within the part; ties keep deterministic url order
        got = list(it)
        if not got:  # empty row-group range: same no-op as the unsorted path
            return
        whole = pa.Table.from_batches(got)
        order = pc.sort_indices(
            whole,
            sort_keys=[
                (cfg.sort_field, "descending" if cfg.sort_desc else "ascending"),
                ("url", "ascending"),
            ],
        )
        whole = whole.take(order)
        for s in range(0, whole.num_rows, cfg.read_batch_rows):
            yield whole.slice(s, cfg.read_batch_rows)

    for tbl in _batches():
        total_len = np.zeros(tbl.num_rows, dtype=np.int64)
        for fname, ftext in _field_texts(tbl, cfg):
            if cfg.store_positions:
                terms, doc_idx, tf, doc_len, pos_arr = analyzer.term_freqs(
                    ftext, positions=True
                )
            else:
                terms, doc_idx, tf, doc_len = analyzer.term_freqs(ftext)
                pos_arr = None
            if fname:
                # per-field term space: "<field>:<term>" (the term dict
                # sorts by (field, term), as Lucene per-field terms do)
                terms = pc.binary_join_element_wise(pa.scalar(fname + ":"), terms, "")
                f_sum_len[fname] += int(doc_len.sum())
                f_doc_count[fname] += int((doc_len > 0).sum())
                flen_acc[fname].append(doc_len.copy())
            total_len += doc_len
            # hash each *distinct* term once (dictionary), fan out via codes
            denc = pc.dictionary_encode(terms)
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = np.asarray(denc.dictionary.to_pylist(), dtype=object)
            tkey_vocab = (term_hash(vocab) % np.uint64(cfg.term_partitions)).astype(np.int32)
            cols = {
                "term": terms,
                "row": pa.array((row_base + doc_idx).astype(np.int32)),
                "tf": pa.array(tf.astype(np.int32)),
                "tkey": pa.array(tkey_vocab[codes]),
                "part": pa.array(np.full(len(codes), part_id, dtype=np.int32)),
            }
            if pos_arr is not None:
                cols["pos"] = pos_arr
            post_batches.append(pa.table(cols, schema=post_schema))
            n_postings += len(doc_idx)
            # partial df: terms are unique per (doc, term) already, so df is
            # a bincount over dictionary codes — vectorized, no Python loop
            df_partials.append(
                pa.table(
                    {
                        "term": denc.dictionary,  # already field-prefixed
                        "df": pa.array(
                            np.bincount(codes, minlength=len(vocab)), pa.int64()
                        ),
                    }
                )
            )
        urls.append(tbl.column("url").combine_chunks())
        langs.append(tbl.column("lang").combine_chunks())
        lens.append(total_len)
        if cfg.sort_field:
            svals.append(
                tbl.column(cfg.sort_field)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
        row_base += tbl.num_rows

    # write the part's postings SORTED by tkey, one Parquet row group per
    # tkey run, and record the (row_group, n_rows) map — this is the map
    # side of the storage shuffle: phase B reads only its bucket's row
    # groups from each part file
    all_post = (
        pa.concat_tables(post_batches)
        if post_batches
        else post_schema.empty_table()
    )
    tkey_np = all_post.column("tkey").combine_chunks().to_numpy()
    order = np.argsort(tkey_np, kind="stable")
    all_post = all_post.take(pa.array(order))
    tkey_sorted = tkey_np[order]
    bounds = np.flatnonzero(np.diff(tkey_sorted) != 0) + 1
    run_starts = np.concatenate([[0], bounds]) if len(tkey_sorted) else np.zeros(0, np.int64)
    run_ends = (
        np.concatenate([bounds, [len(tkey_sorted)]]) if len(tkey_sorted) else np.zeros(0, np.int64)
    )
    tmp_post = post_path + ".tmp"
    # zstd: the shuffle intermediates are read back by phase B — trading
    # cheap decompression CPU (scales with cores) for disk bandwidth (does
    # not) keeps the reduce side compute-bound. Byte diet: `row` ascends in
    # runs (batch-major within each tkey run), so DELTA_BINARY_PACKED cuts
    # it ~5×; tkey/part are constants per run — delta packs them to ~0.
    # Dictionary stays ON only where it wins (terms/tf); the binary pos
    # stream dict-encodes badly and zstd-plain is smaller (zstd-7 on pos
    # was measured: ~0.15 B/posting saved for a 20% phase-A CPU hit —
    # VInt gap streams are near-incompressible, keep level 1).
    writer = pq.ParquetWriter(
        tmp_post,
        post_schema,
        compression="zstd",
        compression_level=1,
        use_dictionary=["term", "tf"],
        column_encoding={
            "row": "DELTA_BINARY_PACKED",
            "tkey": "DELTA_BINARY_PACKED",
            "part": "DELTA_BINARY_PACKED",
        },
    )
    tkey_rgs: dict[str, list[int]] = {}  # tkey -> [row_group_index, n_rows]
    for rg_i, (s, e) in enumerate(zip(run_starts, run_ends)):
        writer.write_table(all_post.slice(int(s), int(e - s)), row_group_size=int(e - s))
        tkey_rgs[str(int(tkey_sorted[s]))] = [rg_i, int(e - s)]
    writer.close()
    os.replace(tmp_post, post_path)

    doc_len_all = np.concatenate(lens) if lens else np.zeros(0, np.int64)
    docs_path = os.path.join(index_dir, "docs", f"part-{part_id:06d}.parquet")
    os.makedirs(os.path.dirname(docs_path), exist_ok=True)
    tmp = docs_path + ".tmp"
    docs_cols = {
        "url": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in urls])
        if urls
        else pa.array([], pa.string()),
        "doc_id": pa.array((part_id << 32) + np.arange(row_base, dtype=np.int64)),
        "doc_len": pa.array(doc_len_all, pa.int64()),
        "norm": pa.array(int_to_byte4_array(doc_len_all)),
        "lang": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in langs])
        if langs
        else pa.array([], pa.string()),
    }
    # per-named-field norms (per-(field, doc) quantized lengths): the
    # reduce side derives each posting's norm from these via the vocab's
    # field prefix instead of shipping a byte per posting
    for fs in cfg.fields:
        fl = flen_acc.get(fs.name) or []
        fl_all = np.concatenate(fl) if fl else np.zeros(row_base, np.int64)
        docs_cols[f"norm_f_{fs.name}"] = pa.array(int_to_byte4_array(fl_all))
    sort_all = np.concatenate(svals) if svals else None
    if cfg.sort_field:
        # the sort docvalue rides in the sidecar, in (sorted) row order —
        # sorted top-k scans this column prefix-first
        docs_cols["sortv"] = pa.array(
            sort_all if sort_all is not None else np.zeros(0), pa.float64()
        )
    pq.write_table(pa.table(docs_cols), tmp)
    os.replace(tmp, docs_path)

    tdf_path = os.path.join(index_dir, "termdf", f"part-{part_id:06d}.parquet")
    os.makedirs(os.path.dirname(tdf_path), exist_ok=True)
    tmp = tdf_path + ".tmp"
    if df_partials:
        tdf = (
            pa.concat_tables(df_partials)
            .group_by("term")
            .aggregate([("df", "sum")])
            .rename_columns(["term", "df"])
            .sort_by("term")
        )
    else:
        tdf = pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    pq.write_table(tdf, tmp)
    os.replace(tmp, tdf_path)

    summary = {
        "part_id": part_id,
        "input_fingerprint": part_fp,
        "n_docs": int(row_base),
        "sum_doc_len": int(doc_len_all.sum()),
        "n_postings": int(n_postings),
        "n_terms_partial": tdf.num_rows,
        "tkey_rgs": tkey_rgs,
        "postings_raw_bytes": os.path.getsize(post_path),
        "sort_min": float(sort_all.min()) if sort_all is not None and len(sort_all) else None,
        "sort_max": float(sort_all.max()) if sort_all is not None and len(sort_all) else None,
        "field_stats": {
            n: {"doc_count": f_doc_count[n], "sum_total_tf": f_sum_len[n]}
            for n in f_sum_len
        },
        "wall_sec": round(time.time() - t0, 3),
        "resumed": False,
    }
    write_json_atomic(man_path, summary)
    return summary


# ---------------------------------------------------------------------------
# Phase B
# ---------------------------------------------------------------------------


def _make_skey_fn(
    heads_ref,
    n_term_parts: int,
    n_doc_parts: int,
    index_dir: str,
    field_names: tuple[str, ...] = (),
):
    import ray

    state: dict = {}

    def add_skey(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tkey = tbl.column("tkey").combine_chunks().to_numpy().astype(np.int64)
        part = tbl.column("part").combine_chunks().to_numpy().astype(np.int64)
        rows_np = tbl.column("row").combine_chunks().to_numpy()
        term_col = tbl.column("term").combine_chunks()
        denc = (
            term_col
            if pa.types.is_dictionary(term_col.type)
            else pc.dictionary_encode(term_col)
        )
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if heads_ref is None:
            skey = tkey * (n_doc_parts + 1)
        else:
            if "heads" not in state:
                state["heads"] = pa.array(sorted(ray.get(heads_ref)), pa.string())
            # membership test on the batch's *dictionary*, fanned out by codes
            salted_vocab = pc.is_in(denc.dictionary, value_set=state["heads"]).to_numpy(
                zero_copy_only=False
            )
            salt = np.where(salted_vocab[codes], part + 1, 0)
            skey = tkey * (n_doc_parts + 1) + salt
        # norm is derived from the docs sidecar per part (cached), field
        # resolved on the dictionary (distinct terms only)
        fid = (
            _field_ids_of_dictionary(denc.dictionary, field_names)
            if field_names
            else None
        )
        norm_np = np.empty(len(rows_np), dtype=np.uint8)
        for p in np.unique(part):
            pid = int(p)
            if ("n", pid) not in state:
                state[("n", pid)] = _load_part_norms(index_dir, pid, field_names)
            m = part == p
            if fid is None:
                norm_np[m] = state[("n", pid)][0, rows_np[m]]
            else:
                norm_np[m] = state[("n", pid)][fid[codes[m]], rows_np[m]]
        doc_id = (part << 32) + rows_np.astype(np.int64)
        cols = {
            "term": tbl.column("term"),
            "doc_id": pa.array(doc_id),
            "tf": tbl.column("tf"),
            "norm": pa.array(norm_np),
            "skey": pa.array(skey, pa.int64()),
        }
        if "pos" in tbl.column_names:
            cols["pos"] = tbl.column("pos")
        return pa.table(cols)

    return add_skey


def _plan_storage_segments(
    index_dir: str, cfg: IndexConfig, parts: list[dict]
) -> list[dict]:
    """Reduce-side plan of the storage shuffle: one task per (tkey, salt).

    Reads the per-part lineage manifests (which carry each part's
    tkey → (row_group, n_rows) map) and chunks every tkey bucket into
    contiguous part ranges of ≤ max_postings_per_segment postings. Chunk
    index = salt; doc ids ascend with part id, so salted sub-segments are
    disjoint ascending doc ranges — the query side concatenates views.
    """
    fp_by_part = {int(p["part_id"]): str(p["fingerprint"]) for p in parts}
    per_part: list[tuple[int, dict]] = []
    for p in parts:
        man = read_json(
            os.path.join(index_dir, "manifests", f"part-{int(p['part_id']):06d}.json")
        )
        if man is None or "tkey_rgs" not in man:
            raise RuntimeError(f"phase A manifest missing for part {p['part_id']}")
        per_part.append((int(p["part_id"]), man["tkey_rgs"]))
    per_part.sort()

    def lineage_of(srcs: list[tuple[int, int, int]]) -> str:
        # identity of the exact inputs that feed this segment: the build
        # config (codec/analysis knobs) plus which parts, which row groups,
        # how many postings, and each part's INPUT fingerprint — so a stale
        # seg dir from a different corpus OR config can never be resumed
        # just because posting counts coincide
        h = hashlib.sha1()
        h.update(cfg.fingerprint_full().encode())
        for part_id, rg, n in srcs:
            h.update(f"{part_id}:{rg}:{n}:{fp_by_part.get(part_id, '')};".encode())
        return h.hexdigest()

    tasks: list[dict] = []
    for t in range(cfg.term_partitions):
        salt, acc = 0, 0
        paths: list[str] = []
        rgs: list[int] = []
        srcs: list[tuple[int, int, int]] = []
        for part_id, tkey_rgs in per_part:
            ent = tkey_rgs.get(str(t))
            if not ent:
                continue
            rg, n = int(ent[0]), int(ent[1])
            if acc and acc + n > cfg.max_postings_per_segment:
                tasks.append(
                    {
                        "tkey": t, "salt": salt, "paths": paths, "rgs": rgs,
                        "expected": acc, "lineage": lineage_of(srcs),
                    }
                )
                salt, acc, paths, rgs, srcs = salt + 1, 0, [], [], []
            paths.append(
                os.path.join(index_dir, "postings_raw", f"part-{part_id:06d}.parquet")
            )
            rgs.append(rg)
            srcs.append((part_id, rg, n))
            acc += n
        if paths:
            tasks.append(
                {
                    "tkey": t, "salt": salt, "paths": paths, "rgs": rgs,
                    "expected": acc, "lineage": lineage_of(srcs),
                }
            )
    return tasks


def _field_ids_of_dictionary(vocab, field_names: tuple[str, ...]) -> np.ndarray:
    """Field-id per dictionary entry: 0 = default field, i+1 =
    field_names[i] (terms are '<field>:<term>'-prefixed). Runs over the
    DISTINCT terms of a row group only, never per posting."""
    fid = np.zeros(len(vocab), dtype=np.int8)
    for i, fname in enumerate(field_names):
        m = pc.starts_with(vocab, fname + ":").to_numpy(zero_copy_only=False)
        fid[m] = i + 1
    return fid


def _load_part_norms(index_dir: str, part_id: int, field_names: tuple[str, ...]):
    """(1 + n_fields, n_docs) uint8 norm matrix from the docs sidecar."""
    cols = ["norm"] + [f"norm_f_{f}" for f in field_names]
    dt = pq.read_table(
        os.path.join(index_dir, "docs", f"part-{part_id:06d}.parquet"), columns=cols
    )
    return np.stack([dt.column(c).to_numpy() for c in cols])


def _make_storage_segment_fn(
    index_dir: str,
    n_doc_parts: int,
    store_positions: bool = False,
    field_names: tuple[str, ...] = (),
    norm_refs: dict | None = None,
):
    read_cols = ["term", "row", "tf"] + (["pos"] if store_positions else [])
    # norm matrices are n_docs bytes TOTAL — when the driver shipped them
    # as per-part object-store refs (norm_refs), a task fetches only its
    # parts from local shared memory instead of re-opening the docs
    # sidecars from disk per task (map_batches re-deserializes the fn per
    # task, so an in-closure disk cache never survives). The disk path
    # stays as the fallback for part counts past the ref-map threshold.
    norm_cache: dict[int, np.ndarray] = {}

    def _norms(part_id: int):
        if part_id not in norm_cache:
            if len(norm_cache) > 512:
                norm_cache.clear()
            if norm_refs is not None and part_id in norm_refs:
                import ray

                norm_cache[part_id] = ray.get(norm_refs[part_id])
            else:
                norm_cache[part_id] = _load_part_norms(index_dir, part_id, field_names)
        return norm_cache[part_id]

    def build_one(batch: pa.Table) -> pa.Table:
        _limit_threads()
        out = []
        for row in batch.to_pylist():
            tkey, salt, expected = int(row["tkey"]), int(row["salt"]), int(row["expected"])
            seg_dir = os.path.join(index_dir, "segments", f"seg-{tkey:05d}-{salt:05d}")
            existing = read_json(os.path.join(seg_dir, "meta.json"))
            if (
                existing is not None
                and existing.get("n_postings") == expected
                and existing.get("tkey") == tkey
                and existing.get("salt") == salt
                and existing.get("lineage") == row["lineage"]
            ):
                meta = existing  # resume: built from exactly these inputs
            else:
                pieces = []
                for p, rg in zip(row["paths"], row["rgs"]):
                    # read_dictionary keeps terms dictionary-encoded end to
                    # end (segment encode sorts the dictionary, not the
                    # postings strings): materializing dense strings here
                    # measured 2.3× slower at 32-way — phase B is memory-
                    # bandwidth-bound, so decompressed width is wall time
                    t = pq.ParquetFile(p, read_dictionary=["term"]).read_row_groups(
                        [rg], columns=read_cols
                    )
                    part_id = int(os.path.basename(p)[len("part-") : -len(".parquet")])
                    rows_np = t.column("row").combine_chunks().to_numpy()
                    doc = (part_id << 32) + rows_np.astype(np.int64)
                    # norm is derived, not shipped: per-(field, doc) value
                    # from the docs sidecar, field resolved on the row
                    # group's DICTIONARY (distinct terms), fanned out by code
                    term = t.column("term").combine_chunks()
                    norms2d = _norms(part_id)
                    if field_names:
                        fid = _field_ids_of_dictionary(term.dictionary, field_names)
                        codes = term.indices.to_numpy(zero_copy_only=False)
                        norm = norms2d[fid[codes], rows_np]
                    else:
                        norm = norms2d[0, rows_np]
                    cols = {
                        "term": term,
                        "doc_id": pa.array(doc),
                        "tf": t.column("tf"),
                        "norm": pa.array(norm),
                    }
                    if store_positions:
                        cols["pos"] = t.column("pos")
                    pieces.append(pa.table(cols))
                group = pa.concat_tables(pieces, promote_options="permissive")
                meta = build_segment_from_group(
                    group, seg_dir, tkey, salt, extra_meta={"lineage": row["lineage"]}
                )
            pids = [
                int(os.path.basename(p)[len("part-") : -len(".parquet")])
                for p in row["paths"]
            ]
            out.append(
                {
                    "skey": tkey * (n_doc_parts + 1) + salt,
                    "tkey": tkey,
                    "salt": salt,
                    "n_terms": int(meta["n_terms"]),
                    "n_postings": int(meta["n_postings"]),
                    "bytes": int(meta["bytes"]),
                    # covered doc-partition range: lets doc-range-sharded
                    # readers open only overlapping segments
                    "part_lo": min(pids),
                    "part_hi": max(pids) + 1,
                    # content lineage, propagated into index_manifest so
                    # index_fingerprint digests content identity, not just
                    # per-segment counts
                    "lineage": str(row["lineage"]),
                }
            )
        int_cols = (
            "skey", "tkey", "salt", "n_terms", "n_postings", "bytes",
            "part_lo", "part_hi",
        )
        return pa.table(
            {
                **{k: pa.array([o[k] for o in out], pa.int64()) for k in int_cols},
                "lineage": pa.array([o["lineage"] for o in out], pa.string()),
            }
        )

    return build_one


def _make_segment_writer(index_dir: str, n_doc_parts: int, cfg_fp: str = ""):
    def write_group(group: pa.Table) -> pa.Table:
        _limit_threads()
        skey = int(group.column("skey")[0].as_py())
        tkey, salt = divmod(skey, n_doc_parts + 1)
        seg_dir = os.path.join(index_dir, "segments", f"seg-{tkey:05d}-{salt:05d}")
        meta_path = os.path.join(seg_dir, "meta.json")
        existing = read_json(meta_path)
        # content checksum: cheap group invariants (order-independent) so a
        # stale segment from a different corpus can't be resumed on a
        # posting-count coincidence
        doc_np = group.column("doc_id").combine_chunks().to_numpy()
        chk = (
            f"{cfg_fp}:{group.num_rows}:"
            f"{int(doc_np.min()) if len(doc_np) else 0}:"
            f"{int(doc_np.max()) if len(doc_np) else 0}:"
            f"{int(pc.sum(group.column('tf')).as_py() or 0)}"
        )
        if (
            existing is not None
            and existing.get("n_postings") == group.num_rows
            and existing.get("tkey") == tkey
            and existing.get("salt") == salt
            and existing.get("checksum") == chk
        ):
            meta = existing  # resume: segment already written for this group
        else:
            meta = build_segment_from_group(
                group, seg_dir, tkey, salt, extra_meta={"checksum": chk}
            )
        return pa.table(
            {
                "skey": pa.array([skey], pa.int64()),
                "tkey": pa.array([tkey], pa.int64()),
                "salt": pa.array([salt], pa.int64()),
                "n_terms": pa.array([meta["n_terms"]], pa.int64()),
                "n_postings": pa.array([meta["n_postings"]], pa.int64()),
                "bytes": pa.array([meta["bytes"]], pa.int64()),
                # content checksum propagated into the manifest (fingerprint)
                "lineage": pa.array([str(meta.get("checksum", chk))], pa.string()),
            }
        )

    return write_group


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def build_index(
    input_path: str | list[str],
    index_dir: str,
    cfg: IndexConfig = IndexConfig(),
) -> dict:
    """Run the full build; resumable; returns the committed manifest."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    t_start = time.time()
    paths = _paths_of(input_path)
    parts = plan_partitions(paths, cfg.target_docs_per_part)
    fingerprints = [p["fingerprint"] for p in parts]

    committed = read_json(os.path.join(index_dir, "index_manifest.json"))
    if (
        committed is not None
        and committed.get("input_fingerprints") == fingerprints
        and committed.get("config") == cfg.fingerprint_full()
    ):
        # fully built & committed — nothing to do; flag it so callers can
        # tell archived metrics from a fresh measurement
        return dict(committed, resumed_commit=True)

    os.makedirs(index_dir, exist_ok=True)

    # ---- Phase A: one task per deterministic doc partition ----
    def run_part(batch: pa.Table) -> pa.Table:
        out = [
            _process_partition(
                {k: batch.column(k)[i].as_py() for k in batch.column_names},
                index_dir,
                cfg,
            )
            for i in range(batch.num_rows)
        ]
        import json

        return pa.table(
            {
                "part_id": pa.array([s["part_id"] for s in out], pa.int64()),
                "n_docs": pa.array([s["n_docs"] for s in out], pa.int64()),
                "sum_doc_len": pa.array([s["sum_doc_len"] for s in out], pa.int64()),
                "n_postings": pa.array([s["n_postings"] for s in out], pa.int64()),
                "resumed": pa.array([s["resumed"] for s in out], pa.bool_()),
                "postings_raw_bytes": pa.array(
                    [int(s.get("postings_raw_bytes", 0)) for s in out], pa.int64()
                ),
                "field_stats": pa.array(
                    [json.dumps(s.get("field_stats", {})) for s in out], pa.string()
                ),
                "sort_min": pa.array([s.get("sort_min") for s in out], pa.float64()),
                "sort_max": pa.array([s.get("sort_max") for s in out], pa.float64()),
            }
        )

    part_ds = rd.from_arrow(
        pa.table(
            {
                "part_id": pa.array([p["part_id"] for p in parts], pa.int64()),
                "path": pa.array([p["path"] for p in parts], pa.string()),
                "rg_start": pa.array([p["rg_start"] for p in parts], pa.int64()),
                "rg_end": pa.array([p["rg_end"] for p in parts], pa.int64()),
                "n_rows": pa.array([p["n_rows"] for p in parts], pa.int64()),
                "fingerprint": pa.array([p["fingerprint"] for p in parts], pa.string()),
            }
        )
    ).repartition(len(parts))
    summaries = part_ds.map_batches(run_part, batch_format="pyarrow", batch_size=1).take_all()
    n_docs = sum(s["n_docs"] for s in summaries)
    sum_doc_len = sum(s["sum_doc_len"] for s in summaries)
    phase_a_sec = time.time() - t_start

    n_doc_parts = len(parts)
    heads: frozenset[str] = frozenset()
    if cfg.shuffle == "storage":
        # ---- Phase B (storage shuffle): no head detection needed — skew is
        # handled uniformly by doc-range bucket splitting in the plan ----
        heads_sec = time.time() - t_start - phase_a_sec
        seg_tasks = _plan_storage_segments(index_dir, cfg, parts)
        # ship the per-part norm matrices once via the object store (n_docs
        # bytes total); past 4096 parts the driver must not hold them all —
        # tasks fall back to reading the docs sidecars directly
        fields_t = tuple(f.name for f in cfg.fields)
        norm_refs = None
        if n_doc_parts <= 4096:
            norm_refs = {
                int(p["part_id"]): ray.put(
                    _load_part_norms(index_dir, int(p["part_id"]), fields_t)
                )
                for p in parts
            }
        seg_summaries = (
            rd.from_items(seg_tasks)
            .map_batches(
                _make_storage_segment_fn(
                    index_dir,
                    n_doc_parts,
                    cfg.store_positions,
                    fields_t,
                    norm_refs,
                ),
                batch_format="pyarrow",
                batch_size=1,
            )
            .take_all()
        )
    else:
        # ---- head-term detection: aggregate over per-part df partials ----
        # Size-adaptive: the termdf sidecars are already per-part aggregated,
        # so at bench scale they are tiny — a driver-side multithreaded Arrow
        # group_by avoids a whole Ray shuffle round. Above the byte threshold
        # (cluster scale: ~vocab × n_parts rows) fall back to the distributed
        # groupby, whose Sum aggregate pre-combines per block.
        tdf_dir = os.path.join(index_dir, "termdf")
        tdf_bytes = sum(
            os.path.getsize(os.path.join(tdf_dir, f)) for f in os.listdir(tdf_dir)
        )
        if tdf_bytes <= 256 << 20:
            tdf_tbl = pq.read_table(tdf_dir)
            agg = tdf_tbl.group_by("term").aggregate([("df", "sum")])
            mask = pc.greater(agg.column("df_sum"), cfg.salt_threshold)
            heads = frozenset(agg.filter(mask).column("term").to_pylist())
        else:
            head_rows = (
                rd.read_parquet(tdf_dir)
                .groupby("term")
                .aggregate(Sum("df", alias_name="df_sum"))
                .filter(expr=f"df_sum > {cfg.salt_threshold}")
                .take_all()
            )
            heads = frozenset(r["term"] for r in head_rows)
        heads_ref = ray.put(heads) if heads else None
        heads_sec = time.time() - t_start - phase_a_sec

        # ---- Phase B (object-store shuffle): the term-hash groupby ----
        # one block per postings partfile: Ray's default read splitting would
        # shatter these small-at-bench-scale files into ~7× more blocks, and
        # the sort shuffle's fixed per-block cost (M blocks × N reducers)
        # dominates
        post = rd.read_parquet(
            os.path.join(index_dir, "postings_raw"), override_num_blocks=n_doc_parts
        )
        post = post.map_batches(
            _make_skey_fn(
                heads_ref,
                cfg.term_partitions,
                n_doc_parts,
                index_dir,
                tuple(f.name for f in cfg.fields),
            ),
            batch_format="pyarrow",
        )
        seg_summaries = (
            post.groupby("skey")
            .map_groups(
                _make_segment_writer(index_dir, n_doc_parts, cfg.fingerprint_full()),
                batch_format="pyarrow",
            )
            .take_all()
        )
    phase_b_sec = time.time() - t_start - phase_a_sec - heads_sec

    field_stats: dict[str, dict[str, int]] = {}
    if cfg.fields:
        import json

        for s in summaries:
            for fname, fs_ in json.loads(s.get("field_stats") or "{}").items():
                agg_f = field_stats.setdefault(
                    fname, {"doc_count": 0, "sum_total_tf": 0}
                )
                agg_f["doc_count"] += int(fs_["doc_count"])
                agg_f["sum_total_tf"] += int(fs_["sum_total_tf"])

    stats = {
        "field": "text",
        "doc_count": int(n_docs),
        "sum_total_tf": int(sum_doc_len),
        "n_doc_parts": n_doc_parts,
        "max_part_rows": int(max((s["n_docs"] for s in summaries), default=0)),
        "term_partitions": cfg.term_partitions,
        "n_segments": len(seg_summaries),
        "head_terms": sorted(heads),
    }
    if cfg.sort_field:
        stats["sort_field"] = cfg.sort_field
        stats["sort_desc"] = cfg.sort_desc
        # per-part sort ranges: the early-termination skip table (the
        # Lucene per-segment sort metadata analog)
        stats["doc_parts"] = sorted(
            (
                {
                    "part_id": int(s["part_id"]),
                    "sort_min": s.get("sort_min"),
                    "sort_max": s.get("sort_max"),
                    "n_docs": int(s["n_docs"]),
                }
                for s in summaries
            ),
            key=lambda r: r["part_id"],
        )
    if field_stats:
        stats["fields"] = {k: field_stats[k] for k in sorted(field_stats)}
    write_json_atomic(os.path.join(index_dir, "stats.json"), stats)

    man = {
        "config": cfg.fingerprint_full(),
        "input_fingerprints": fingerprints,
        "stats": stats,
        "segments": sorted(
            [
                dict(
                    {
                        k: int(s[k])
                        for k in (
                            "skey", "tkey", "salt", "n_terms", "n_postings", "bytes",
                        )
                    },
                    name=f"seg-{int(s['tkey']):05d}-{int(s['salt']):05d}",
                    part_lo=int(s.get("part_lo", 0)),
                    part_hi=int(s.get("part_hi", n_doc_parts)),
                    lineage=str(s.get("lineage", "")),
                )
                for s in seg_summaries
            ],
            key=lambda s: s["skey"],
        ),
        "metrics": {
            "n_docs": int(n_docs),
            "n_postings": int(sum(s["n_postings"] for s in summaries)),
            "postings_raw_bytes": int(
                sum(s.get("postings_raw_bytes", 0) for s in summaries)
            ),
            "postings_raw_bytes_per_posting": round(
                sum(s.get("postings_raw_bytes", 0) for s in summaries)
                / max(1, sum(s["n_postings"] for s in summaries)),
                3,
            ),
            "phase_a_sec": round(phase_a_sec, 3),
            "heads_sec": round(heads_sec, 3),
            "phase_b_sec": round(phase_b_sec, 3),
            "total_sec": round(time.time() - t_start, 3),
            "docs_per_sec": round(n_docs / max(1e-9, time.time() - t_start), 1),
            "parts_resumed": int(sum(1 for s in summaries if s["resumed"])),
        },
    }
    # re-assert purge-merged deletes BEFORE the commit point: phase B just
    # rebuilt segments from postings_raw, which still contains any docs a
    # previous purge-merge physically reclaimed (deletes.record_purged)
    from apache___solr_ray.deletes import reapply_purged

    n_reapplied, n_unapplied = reapply_purged(index_dir, fingerprints)
    if n_reapplied:
        man["metrics"]["tombstones_reapplied"] = n_reapplied
    if n_unapplied:
        # loud signal: purged docs whose partitions are not in this layout
        # could NOT be re-asserted — they are live again until the ledger
        # partition reappears. Recorded in build stats so callers can gate.
        man["metrics"]["tombstones_unapplied"] = n_unapplied
    write_json_atomic(os.path.join(index_dir, "index_manifest.json"), man)
    return man
