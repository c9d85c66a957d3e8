"""Persisted IVF (inverted-file) ANN index over an embedding column — the
DenseVectorField analog (reference
``solr/core/src/java/org/apache/solr/schema/DenseVectorField.java``: the
vector index is a PERSISTED per-segment artifact built at index time and
only *searched* at query time; here the coarse quantizer + list-partitioned
vectors play the role of the HNSW graph).

Build (once, resumable — same manifest/lineage discipline as the text
segments):

1. train a deterministic k-means coarse quantizer on a BOUNDED sample of
   the corpus (O(n_lists) × oversampling rows, streamed — never the full
   table);
2. assign every vector to its nearest centroid inside ``map_batches``
   (centroids broadcast via ``ray.put``) and write the corpus as
   list-partitioned Parquet (``list_id=<j>/``) — at 10^12 scale each list
   is a directory of many files and the assignment is a single streaming
   pass;
3. commit ``ivf_manifest.json`` atomically with the centroid matrix, the
   input fingerprint and per-list row counts.

Query: read ONLY the probed lists' directories (storage pruning — the
whole point of IVF), score each block vectorized, keep a per-block top-k,
then merge the tiny per-block winners with one driver-side k-way sort
(``n_blocks × k`` rows — never the candidate stream).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from apache___solr_ray.manifest import read_json, write_json_atomic

IVF_MANIFEST = "ivf_manifest.json"


def _input_fingerprint(parquet_path: str) -> str:
    md = pq.ParquetFile(parquet_path).metadata
    return f"{os.path.basename(parquet_path)}:{md.num_rows}:{os.path.getsize(parquet_path)}"


def train_centroids(
    ds,
    vec_col: str,
    id_col: str,
    n_lists: int,
    iters: int = 5,
    max_train: int = 65_536,
    seed: int = 11,
) -> np.ndarray:
    """Deterministic Lloyd k-means on a bounded every-k-th-row sample
    streamed through ``iter_batches`` — the stream stops after
    ``max_train`` rows, so training cost is independent of corpus size."""
    n_total = ds.count()
    step = max(1, n_total // max_train)
    rows: list[np.ndarray] = []
    taken = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        ids = b.column(id_col).to_numpy()
        keep = (ids % step) == 0
        if keep.any():
            rows.append(
                np.array(
                    b.column(vec_col).take(pa.array(np.flatnonzero(keep))).to_pylist(),
                    dtype=np.float64,
                )
            )
            taken += int(keep.sum())
        if taken >= max_train:
            break
    X = np.concatenate(rows) if rows else np.zeros((0, 0))
    rng = np.random.Generator(np.random.PCG64(seed))
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def build_ivf_index(
    parquet_path: str,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 8,
    extra_cols: tuple[str, ...] = (),
) -> dict:
    """Build (or resume) the persisted IVF index. Returns the manifest."""
    import ray
    import ray.data as rd

    fp = _input_fingerprint(parquet_path)
    man = read_json(os.path.join(index_dir, IVF_MANIFEST))
    if man is not None and man.get("input_fingerprint") == fp and man.get("n_lists") == n_lists:
        return man  # committed for exactly this input — nothing to do

    cols = [id_col, vec_col, *extra_cols]
    ds = rd.read_parquet(parquet_path, columns=cols)
    C = train_centroids(ds, vec_col, id_col, n_lists)
    cref = ray.put(C)
    state: dict = {}

    def assign(t: pa.Table) -> pa.Table:
        if "C" not in state:
            state["C"] = ray.get(cref)
        X = np.array(t.column(vec_col).to_pylist(), dtype=np.float64)
        if len(X) == 0:
            return t.append_column("list_id", pa.array([], pa.int64()))
        d = ((X[:, None, :] - state["C"][None, :, :]) ** 2).sum(axis=2)
        return t.append_column("list_id", pa.array(d.argmin(axis=1).astype(np.int64)))

    lists_dir = os.path.join(index_dir, "lists")
    assigned = ds.map_batches(assign, batch_format="pyarrow")
    assigned.write_parquet(lists_dir, partition_cols=["list_id"], mode="overwrite")

    # per-list row counts from the written files (cheap metadata reads)
    counts: dict[str, int] = {}
    for name in sorted(os.listdir(lists_dir)):
        if not name.startswith("list_id="):
            continue
        j = name.split("=", 1)[1]
        n = 0
        sub = os.path.join(lists_dir, name)
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(sub, f)).metadata.num_rows
        counts[j] = n

    man = {
        "input_fingerprint": fp,
        "n_lists": int(n_lists),
        "dim": int(C.shape[1]) if C.size else 0,
        "vec_col": vec_col,
        "id_col": id_col,
        "centroids": [[float(x) for x in row] for row in C],
        "list_counts": counts,
    }
    write_json_atomic(os.path.join(index_dir, IVF_MANIFEST), man)
    return man


def ivf_probe_lists(man: dict, qv: np.ndarray, nprobe: int) -> list[int]:
    C = np.array(man["centroids"], dtype=np.float64)
    qd = ((C - qv[None, :]) ** 2).sum(axis=1)
    return [int(j) for j in np.argsort(qd, kind="stable")[:nprobe]]


def ivf_topk(
    index_dir: str,
    qv: np.ndarray,
    k: int = 20,
    nprobe: int = 4,
    exclude_id: int | None = None,
):
    """Top-k cosine over the probed lists ONLY. Returns an Arrow table
    (id_col, cos) sorted by (cos desc, id asc). Reads just the probed
    lists' files; each block contributes at most k candidate rows, and the
    driver merges ``n_blocks × k`` rows — candidate streams never leave
    the cluster."""
    import ray
    import ray.data as rd

    man = read_json(os.path.join(index_dir, IVF_MANIFEST))
    if man is None:
        raise FileNotFoundError(f"no committed IVF index at {index_dir}")
    id_col, vec_col = man["id_col"], man["vec_col"]
    probe = ivf_probe_lists(man, qv, nprobe)
    paths = [
        os.path.join(index_dir, "lists", f"list_id={j}")
        for j in probe
        if os.path.isdir(os.path.join(index_dir, "lists", f"list_id={j}"))
    ]
    if not paths:
        return pa.table({id_col: pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
    qref = ray.put(np.asarray(qv, dtype=np.float64))
    state: dict = {}

    def block_topk(t: pa.Table) -> pa.Table:
        if "q" not in state:
            state["q"] = ray.get(qref)
            state["qn"] = np.linalg.norm(state["q"])
        X = np.array(t.column(vec_col).to_pylist(), dtype=np.float64)
        ids = t.column(id_col).to_numpy()
        if exclude_id is not None:
            keep = ids != exclude_id
            X, ids = X[keep], ids[keep]
        if len(X) == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
        cos = (X @ state["q"]) / np.maximum(1e-300, np.linalg.norm(X, axis=1) * state["qn"])
        if len(cos) > k:
            part = np.argpartition(-cos, k - 1)[:k]
            # deterministic within-block order: (cos desc, id asc)
            part = part[np.lexsort((ids[part], -cos[part]))]
        else:
            part = np.lexsort((ids, -cos))
        return pa.table(
            {
                id_col: pa.array(ids[part], pa.int64()),
                "cos": pa.array(cos[part], pa.float64()),
            }
        )

    files = [
        os.path.join(p, f)
        for p in paths
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    winners = (
        rd.read_parquet(files, columns=[id_col, vec_col])
        .map_batches(block_topk, batch_format="pyarrow")
    )
    # tiny k-way merge: n_blocks × k rows
    merged = pa.concat_tables([ray.get(r) for r in winners.to_arrow_refs()])
    if merged.num_rows == 0:
        return merged
    idx = np.lexsort((merged.column(id_col).to_numpy(), -merged.column("cos").to_numpy()))[:k]
    return merged.take(pa.array(idx))
