"""Index-side MinHash similarity — the MinHashQParser analog (reference
``solr/core/src/java/org/apache/solr/search/MinHashQParser.java``: a query
that matches documents whose MinHash signature overlaps the query's, i.e.
"find documents similar to this one" answered FROM the index, not by a
corpus-wide dedup pass).

Build (once, resumable — manifest discipline like the text segments / IVF
/ HNSW artifacts): ONE streaming tokenize pass over the corpus (the same
(id, shingle-hash set, band keys) payload the near-dup pipeline
checkpoints — stages/dedup.minhash_token_bands_ds semantics) persisted as
TWO partitioned parquet layouts:

- ``bands/bpart=<band_hash % P>/``  (doc_id, band, band_hash) — the LSH
  postings: a query probes ONLY the partitions its own band keys hash to;
- ``grams/gpart=<doc_id % P>/``     (doc_id, th) — the exact-verify
  payload (sorted distinct shingle hashes, uint64 LE bytes), read only
  for the query doc and the candidates.

Query: recompute the query doc's band keys from its stored gram set (the
hasher parameters live in the manifest), probe the matching band
partitions for bucket-mates, then verify candidates with EXACT integer
Jaccard over the gram sets — the same guarantee the near-dup oracle uses
(recall at J>=0.9 is 1-4e-8 with 16x4 banding). Candidates are bounded by
LSH bucket sizes (a hot bucket means near-identical docs; the dedup path
caps them with a star pattern — here the per-query candidate set is
df-of-one-doc sized by construction).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from apache___solr_ray.manifest import read_json, write_json_atomic

MINHASH_MANIFEST = "minhash_manifest.json"


def _input_fingerprint(parquet_path: str) -> str:
    md = pq.ParquetFile(parquet_path).metadata
    return f"{os.path.basename(parquet_path)}:{md.num_rows}:{os.path.getsize(parquet_path)}"


def build_minhash_sidecar(
    parquet_path: str,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
    n_parts: int = 8,
) -> dict:
    """Build (or resume) the persisted MinHash sidecar. The tokenize pass
    is the phase-A-shaped single sweep; both layouts are written from the
    one materialized checkpoint. At 10^12 docs ``n_parts`` scales with the
    corpus so each partition stays a bounded directory of files."""
    import ray.data as rd

    from apache___solr_ray.stages.dedup import explode_bands, minhash_token_bands_ds

    fp = _input_fingerprint(parquet_path)
    man = read_json(os.path.join(index_dir, MINHASH_MANIFEST))
    if (
        man is not None
        and man.get("input_fingerprint") == fp
        and man.get("bands") == bands
        and man.get("n_parts") == n_parts
    ):
        return man

    ds = rd.read_parquet(parquet_path, columns=[id_col, text_col])
    combined = minhash_token_bands_ds(
        ds, text_col, id_col, num_hashes=num_hashes, bands=bands, shingle=shingle
    )

    def add_gpart(t: pa.Table) -> pa.Table:
        g = (t.column(id_col).to_numpy() % n_parts).astype(np.int64)
        return t.select([id_col, "th"]).append_column("gpart", pa.array(g))

    combined.map_batches(add_gpart, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "grams"), partition_cols=["gpart"], mode="overwrite"
    )

    def add_bpart(t: pa.Table) -> pa.Table:
        b = (t.column("band_hash").to_numpy() % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("bpart", pa.array(b))

    explode_bands(combined, id_col, bands).map_batches(
        add_bpart, batch_format="pyarrow"
    ).write_parquet(
        os.path.join(index_dir, "bands"), partition_cols=["bpart"], mode="overwrite"
    )

    man = {
        "input_fingerprint": fp,
        "num_hashes": int(num_hashes),
        "bands": int(bands),
        "shingle": int(shingle),
        "n_parts": int(n_parts),
        "id_col": id_col,
    }
    write_json_atomic(os.path.join(index_dir, MINHASH_MANIFEST), man)
    return man


def _part_files(base: str, key: str, parts: set[int]) -> list[str]:
    out = []
    for p in sorted(parts):
        d = os.path.join(base, f"{key}={p}")
        if os.path.isdir(d):
            out += [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    return out


def minhash_similar(
    index_dir: str,
    query_doc: int,
    threshold_num: int = 9,
    threshold_den: int = 10,
) -> pa.Table:
    """Docs similar to ``query_doc`` (exact gram-set Jaccard >= num/den,
    integer arithmetic) found via the persisted LSH sidecar. Returns
    (doc_id, inter, uni) sorted by doc_id. Reads: 1 gram partition for the
    query doc, <= bands distinct band partitions for the probe, and the
    candidates' gram partitions — never the corpus."""
    import ray.data as rd

    from apache___solr_ray.stages.dedup import MinHasher, _fold_bands

    man = read_json(os.path.join(index_dir, MINHASH_MANIFEST))
    if man is None:
        raise FileNotFoundError(f"no committed MinHash sidecar at {index_dir}")
    id_col, n_parts, bands = man["id_col"], man["n_parts"], man["bands"]

    # 1) the query doc's gram set (one partition read)
    gfiles = _part_files(os.path.join(index_dir, "grams"), "gpart", {query_doc % n_parts})
    qt = pq.read_table(gfiles, columns=[id_col, "th"])
    qt = qt.filter(pc.equal(qt.column(id_col), query_doc))
    if qt.num_rows == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "inter": pa.array([], pa.int64()),
             "uni": pa.array([], pa.int64())}
        )
    th_q = np.frombuffer(qt.column("th")[0].as_py(), dtype=np.uint64)

    # 2) band keys from the stored set (hasher params from the manifest)
    mh = MinHasher(man["num_hashes"], man["shingle"])
    keys = _fold_bands(mh.signatures_from_sets([th_q]), bands)[0]
    key_set = np.unique(keys)
    bfiles = _part_files(
        os.path.join(index_dir, "bands"),
        "bpart",
        {int(k % np.uint64(n_parts)) for k in key_set},
    )

    def probe(t: pa.Table) -> pa.Table:
        bh = t.column("band_hash").to_numpy()
        keep = np.isin(bh, key_set) & (t.column(id_col).to_numpy() != query_doc)
        return pa.table({id_col: pa.array(t.column(id_col).to_numpy()[keep], pa.int64())})

    cand_ids = np.unique(
        np.concatenate(
            [
                b.column(id_col).to_numpy()
                for b in rd.read_parquet(bfiles, columns=[id_col, "band_hash"])
                .map_batches(probe, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
            ]
            or [np.zeros(0, np.int64)]
        )
    )
    if len(cand_ids) == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "inter": pa.array([], pa.int64()),
             "uni": pa.array([], pa.int64())}
        )

    # 3) exact verify over the candidates' stored gram sets
    cfiles = _part_files(
        os.path.join(index_dir, "grams"), "gpart", {int(c) % n_parts for c in cand_ids}
    )

    def verify(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        keep = np.isin(ids, cand_ids)
        ids = ids[keep]
        out_i, out_u, out_id = [], [], []
        for i, buf in enumerate(t.column("th").filter(pa.array(keep)).to_pylist()):
            s = np.frombuffer(buf, dtype=np.uint64)
            inter = len(np.intersect1d(s, th_q, assume_unique=True))
            uni = len(s) + len(th_q) - inter
            if threshold_den * inter >= threshold_num * uni:
                out_id.append(int(ids[i]))
                out_i.append(inter)
                out_u.append(uni)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "inter": pa.array(out_i, pa.int64()),
                "uni": pa.array(out_u, pa.int64()),
            }
        )

    out = pa.concat_tables(
        list(
            rd.read_parquet(cfiles, columns=[id_col, "th"])
            .map_batches(verify, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
        or [
            pa.table(
                {id_col: pa.array([], pa.int64()), "inter": pa.array([], pa.int64()),
                 "uni": pa.array([], pa.int64())}
            )
        ]
    )
    if out.num_rows:
        out = out.take(pa.array(np.argsort(out.column(id_col).to_numpy(), kind="stable")))
    return out
