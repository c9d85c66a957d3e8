"""Persisted per-segment navigable-small-world (HNSW-family) ANN index —
the DenseVectorField graph analog (reference
``solr/core/src/java/org/apache/solr/schema/DenseVectorField.java``: Lucene
persists an HNSW graph PER SEGMENT at index time — knnVectorsFormat with
``hnswMaxConnections``/``hnswBeamWidth`` — and queries search each segment's
graph and merge). This module mirrors that shape on Ray Data:

- the corpus is split into bounded SEGMENTS (deterministic ``vec_id``
  hash); each segment's graph is built INDEPENDENTLY and in parallel
  (``grouped_map`` — one Python call per segment), exactly Lucene's
  per-segment build;
- each graph is a single-layer NSW (Lucene's layer 0, where >95% of the
  work happens; the hierarchy's log-n entry descent matters only when a
  single graph holds the whole corpus — here segments are bounded, so the
  fixed entry point plays that role). Insertion: beam-search the partial
  graph (``ef_construction``), connect bidirectionally to the best ``M``,
  prune adjacency to ``2M`` by similarity — the standard NSW/HNSW
  construction (Malkov & Yashunin, 2016);
- vectors are L2-normalized at BUILD time (cosine == inner product at
  query time) and persisted WITH the adjacency lists as per-segment
  Parquet plus an atomic ``hnsw_manifest.json`` (same manifest/lineage
  discipline as the text segments and the IVF index) — the graph build is
  completely absent from query time;
- query: one Ray task per segment reads ONLY that segment's file, runs a
  beam search (``ef_search``), returns its top-k; the driver merges
  ``n_segments × k`` rows. Beam search touches ~ef·M nodes per segment —
  the probe budget the recall gate is measured against.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from apache___solr_ray.manifest import read_json, write_json_atomic

HNSW_MANIFEST = "hnsw_manifest.json"


def _input_fingerprint(parquet_path: str) -> str:
    md = pq.ParquetFile(parquet_path).metadata
    return f"{os.path.basename(parquet_path)}:{md.num_rows}:{os.path.getsize(parquet_path)}"


# ---------------------------------------------------------------------------
# Graph construction (single-threaded per segment; segments run in parallel)
# ---------------------------------------------------------------------------


def _beam_search(
    X: np.ndarray,
    nbrs: np.ndarray,
    deg: np.ndarray,
    q: np.ndarray,
    ef: int,
    n_nodes: int | None = None,
    entry: int = 0,
):
    """Greedy beam search over the (partial) graph. Returns
    (list[(sim, node)] sorted best-first, visited_count). ``n_nodes``
    restricts to the first n nodes (during construction the graph only
    contains already-inserted vectors)."""
    n = len(X) if n_nodes is None else n_nodes
    if n == 0:
        return [], 0
    visited = np.zeros(n, dtype=bool)
    s0 = float(X[entry] @ q)
    visited[entry] = True
    cand = [(-s0, entry)]  # max-heap by sim
    res = [(s0, entry)]  # min-heap of the best ef
    n_visited = 1
    while cand:
        neg, u = heapq.heappop(cand)
        if -neg < res[0][0] and len(res) >= ef:
            break
        for v in nbrs[u, : deg[u]]:
            v = int(v)
            if v >= n or visited[v]:
                continue
            visited[v] = True
            n_visited += 1
            sv = float(X[v] @ q)
            if len(res) < ef or sv > res[0][0]:
                heapq.heappush(cand, (-sv, v))
                heapq.heappush(res, (sv, v))
                if len(res) > ef:
                    heapq.heappop(res)
    return sorted(res, key=lambda t: (-t[0], t[1])), n_visited


def _prune_to(X: np.ndarray, nbrs: np.ndarray, deg: np.ndarray, a: int, cap: int):
    """Keep node a's ``cap`` most-similar neighbors (ties: smaller id)."""
    cur = nbrs[a, : deg[a]].astype(np.int64)
    sims = X[cur] @ X[a]
    order = np.lexsort((cur, -sims))[:cap]
    kept = cur[order]
    nbrs[a, : len(kept)] = kept
    deg[a] = len(kept)


def build_nsw_graph(X: np.ndarray, M: int = 8, ef_construction: int = 64):
    """Incremental NSW construction over L2-normalized rows. Returns
    (neighbors int32 (n, 2M) padded with -1, degrees int32 (n,))."""
    n = len(X)
    m_max = 2 * M
    nbrs = np.full((n, m_max + 1), -1, dtype=np.int32)  # +1 slack before prune
    deg = np.zeros(n, dtype=np.int32)
    for i in range(1, n):
        found, _ = _beam_search(X, nbrs, deg, X[i], ef_construction, n_nodes=i)
        for _, j in found[:M]:
            # connect i <-> j, pruning either side past m_max
            nbrs[i, deg[i]] = j
            deg[i] += 1
            nbrs[j, deg[j]] = i
            deg[j] += 1
            if deg[j] > m_max:
                _prune_to(X, nbrs, deg, j, m_max)
        if deg[i] > m_max:
            _prune_to(X, nbrs, deg, i, m_max)
    return nbrs[:, :m_max], np.minimum(deg, m_max)


# ---------------------------------------------------------------------------
# Build (persisted, resumable)
# ---------------------------------------------------------------------------


def build_hnsw_index(
    parquet_path: str,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_segments: int = 4,
    M: int = 8,
    ef_construction: int = 64,
) -> dict:
    """Build (or resume — committed-manifest short-circuit) the per-segment
    NSW index. Segment assignment is ``vec_id % n_segments`` (deterministic,
    balanced); each segment graph builds in ONE parallel task. At 10^12
    vectors n_segments grows with the corpus so each segment stays bounded
    (Lucene bounds segments the same way via maxBufferedDocs/merge policy)."""
    import pandas as pd
    import ray.data as rd

    fp = _input_fingerprint(parquet_path)
    man = read_json(os.path.join(index_dir, HNSW_MANIFEST))
    if (
        man is not None
        and man.get("input_fingerprint") == fp
        and man.get("n_segments") == n_segments
        and man.get("M") == M
        and man.get("ef_construction") == ef_construction
    ):
        return man

    ds = rd.read_parquet(parquet_path, columns=[id_col, vec_col])

    def add_seg(t: pa.Table) -> pa.Table:
        seg = (t.column(id_col).to_numpy() % n_segments).astype(np.int64)
        return t.append_column("seg", pa.array(seg))

    def build_segment(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        X = np.stack(df[vec_col].to_numpy()).astype(np.float32)
        X /= np.maximum(1e-30, np.linalg.norm(X, axis=1))[:, None]
        nbrs, deg = build_nsw_graph(X.astype(np.float64), M, ef_construction)
        # plain Python lists => Arrow list<> columns (numpy cells would
        # become Ray's tensor extension type, unreadable by plain pyarrow
        # in the query tasks); production layout would use
        # fixed_size_list<float32> to halve vector storage
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "vec_n": [row.tolist() for row in X],
                "neighbors": [nbrs[i, : deg[i]].tolist() for i in range(len(X))],
                "seg": df["seg"].to_numpy(),
            }
        )

    from apache___solr_ray.pipelines.common import grouped_map

    built = grouped_map(
        ds.map_batches(add_seg, batch_format="pyarrow"),
        "seg",
        lambda df: pd.concat(
            [build_segment(g) for _, g in df.groupby("seg", sort=True)],
            ignore_index=True,
        ),
    )
    segs_dir = os.path.join(index_dir, "segs")
    built.write_parquet(segs_dir, partition_cols=["seg"], mode="overwrite")

    counts: dict[str, int] = {}
    for name in sorted(os.listdir(segs_dir)):
        if not name.startswith("seg="):
            continue
        j = name.split("=", 1)[1]
        sub = os.path.join(segs_dir, name)
        counts[j] = sum(
            pq.ParquetFile(os.path.join(sub, f)).metadata.num_rows
            for f in os.listdir(sub)
            if f.endswith(".parquet")
        )

    man = {
        "input_fingerprint": fp,
        "n_segments": int(n_segments),
        "M": int(M),
        "ef_construction": int(ef_construction),
        "vec_col": vec_col,
        "id_col": id_col,
        "seg_counts": counts,
    }
    write_json_atomic(os.path.join(index_dir, HNSW_MANIFEST), man)
    return man


# ---------------------------------------------------------------------------
# Query (one task per segment; graph build absent)
# ---------------------------------------------------------------------------


def _search_segment_table(
    t: pa.Table, qv64: np.ndarray, k: int, ef_search: int, id_col: str, exclude_id
):
    ids = t.column(id_col).to_numpy()
    order = np.argsort(ids, kind="stable")  # local index = build order (id-sorted)
    t = t.take(pa.array(order))
    ids = ids[order]
    X = np.stack(t.column("vec_n").to_numpy(zero_copy_only=False)).astype(np.float64)
    n = len(X)
    m_max = max((len(r) for r in t.column("neighbors").to_pylist()), default=0)
    nbrs = np.full((n, max(1, m_max)), -1, dtype=np.int32)
    deg = np.zeros(n, dtype=np.int32)
    for i, row in enumerate(t.column("neighbors").to_pylist()):
        nbrs[i, : len(row)] = row
        deg[i] = len(row)
    q = qv64 / max(1e-30, float(np.linalg.norm(qv64)))
    found, visited = _beam_search(X, nbrs, deg, q, max(ef_search, k + 1))
    out_ids, out_cos = [], []
    for s, node in found:
        vid = int(ids[node])
        if exclude_id is not None and vid == exclude_id:
            continue
        out_ids.append(vid)
        out_cos.append(s)
        if len(out_ids) >= k:
            break
    return (
        pa.table(
            {id_col: pa.array(out_ids, pa.int64()), "cos": pa.array(out_cos, pa.float64())}
        ),
        visited,
        n,
    )


def hnsw_topk(
    index_dir: str,
    qv: np.ndarray,
    k: int = 20,
    ef_search: int = 96,
    exclude_id: int | None = None,
    with_stats: bool = False,
):
    """Top-k cosine via per-segment beam searches run as parallel Ray
    tasks — each task reads ONLY its segment's parquet (same storage
    pruning as ivf_topk). Driver merges n_segments × k rows. With
    ``with_stats`` returns (table, visited_nodes, total_nodes) so tests
    can assert the probe budget."""
    import ray

    man = read_json(os.path.join(index_dir, HNSW_MANIFEST))
    if man is None:
        raise FileNotFoundError(f"no committed HNSW index at {index_dir}")
    id_col = man["id_col"]
    qv64 = np.asarray(qv, dtype=np.float64)

    @ray.remote
    def search_one(seg_dir: str):
        t = pq.read_table(seg_dir, columns=[id_col, "vec_n", "neighbors"])
        return _search_segment_table(t, qv64, k, ef_search, id_col, exclude_id)

    segs_dir = os.path.join(index_dir, "segs")
    seg_dirs = [
        os.path.join(segs_dir, name)
        for name in sorted(os.listdir(segs_dir))
        if name.startswith("seg=")
    ]
    parts = ray.get([search_one.remote(d) for d in seg_dirs])
    merged = pa.concat_tables([p[0] for p in parts])
    visited = sum(p[1] for p in parts)
    total = sum(p[2] for p in parts)
    if merged.num_rows:
        idx = np.lexsort(
            (merged.column(id_col).to_numpy(), -merged.column("cos").to_numpy())
        )[:k]
        merged = merged.take(pa.array(idx))
    if with_stats:
        return merged, visited, total
    return merged
