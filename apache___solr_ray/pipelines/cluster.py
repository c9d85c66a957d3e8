"""Distributed document clustering (reference: the Solr clustering module —
solr/modules/clustering's ClusteringComponent, which groups search results /
documents into labeled clusters via a pluggable engine). The engine here is
distributed Lloyd k-means over the ``embeddings`` table, expressed
Ray-Data-first:

- init: centroids = the vectors of the K smallest ``vec_id``s (deterministic,
  no RNG — resumable and oracle-mirrorable);
- each iteration is ONE streaming pass: centroids broadcast via ``ray.put``,
  ``map_batches`` emits per-batch PARTIAL (cluster, count, component sums) —
  k×(d+1) floats per block — and the driver reduces the tiny partials
  (O(k·d·n_blocks), never the corpus) to new centroids;
- assignment math is f64 with explicit per-component squared differences in
  component order, so a DuckDB oracle can mirror the computation (3 unrolled
  iterations of assign→recompute CTEs).

Empty clusters keep +inf centroids (nothing re-assigns to them), matching
the oracle where an empty cluster simply drops out of the recompute join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from apache___solr_ray.sources import load

QUERIES: dict = {}
ORACLE: dict = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


K_CLUSTERS = 4
K_ITERS = 3


def _emb_matrix(t: pa.Table) -> np.ndarray:
    """Zero-copy-ish list<float> -> (n, d) float64. Uses ``flatten()`` (not
    ``.values``) so sliced/offset list chunks yield exactly the slice's
    elements — ``.values`` covers the whole parent buffer and would misalign
    rows for offset batches."""
    col = t.column("embedding").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    assert n == 0 or flat.size % n == 0, (flat.size, n)
    return flat.reshape(n, -1)


def _assign(E: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row: explicit (e-c)^2 sums in component
    order (f64) so the SQL mirror's ``sum((v-cv)^2)`` agrees; np.argmin's
    first-wins tie-break == the oracle's ORDER BY d, c."""
    # (n, k): sum over d of squared diffs, accumulated in component order
    n, d = E.shape
    out = np.zeros((n, len(C)), dtype=np.float64)
    for j in range(d):  # d is small (embedding dim); n stays vectorized
        diff = E[:, j, None] - C[None, :, j]
        out += diff * diff
    # Round distances to 1e-6 before argmin (mirrored in the SQL oracle's
    # floor(d*1e6+0.5)/1e6): f64 accumulation ORDER differs between numpy
    # and DuckDB's SUM, so raw near-ties (~1e-14 apart) could flip argmin
    # nondeterministically; after rounding both sides tie-break by cluster
    # id (np.argmin first-wins == ORDER BY d, c).
    out = np.floor(out * 1e6 + 0.5) / 1e6
    return np.argmin(out, axis=1)


def kmeans_fit(sf_dir: str, k: int = K_CLUSTERS, iters: int = K_ITERS):
    """Run distributed Lloyd k-means; returns (labels_of_centroid_row,
    centroids) where labels are the init vec_ids (cluster names)."""
    import ray

    ds = load(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def seed_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.less(t.column("vec_id"), k))

    rows = ds.map_batches(seed_filter, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    labels = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    C = np.array([r["embedding"] for r in rows], dtype=np.float64)

    # iters assignments total: (iters-1) assign+recompute passes here, the
    # caller's final assignment is the iters-th (mirrors the oracle's
    # a1..c1..a2..c2..a3 chain)
    for _ in range(iters - 1):
        cref = ray.put(C)
        state: dict = {}

        def partial(t: pa.Table) -> pa.Table:
            if "C" not in state:
                state["C"] = ray.get(cref)
            if t.num_rows == 0:
                kk0, dd0 = state["C"].shape
                return pa.table(
                    {
                        "cluster": pa.array(np.arange(kk0, dtype=np.int64)),
                        "n": pa.array(np.zeros(kk0, dtype=np.int64)),
                        "sums": pa.array(
                            np.zeros((kk0, dd0)).tolist(), pa.list_(pa.float64())
                        ),
                    }
                )
            E = _emb_matrix(t)
            a = _assign(E, state["C"])
            kk, dd = state["C"].shape
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            sums = np.zeros((kk, dd), dtype=np.float64)
            np.add.at(sums, a, E)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                    "n": pa.array(cnt),
                    "sums": pa.array(sums.tolist(), pa.list_(pa.float64())),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        kk, dd = C.shape
        tot_n = np.zeros(kk, dtype=np.int64)
        tot_s = np.zeros((kk, dd), dtype=np.float64)
        for row in parts:
            ci = int(row["cluster"])
            tot_n[ci] += int(row["n"])
            tot_s[ci] += np.asarray(row["sums"], dtype=np.float64)
        C = np.where(tot_n[:, None] > 0, tot_s / np.maximum(tot_n, 1)[:, None], np.inf)
    return labels, C


def _kmeans_oracle_sql(k: int, iters: int) -> str:
    """Unrolled Lloyd iterations as CTE chains over parallel-unnested
    (doc, component) rows."""
    ctes = [
        f"""ev AS (SELECT vec_id, unnest(range(len(embedding))) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)""",
        f"c0 AS (SELECT vec_id AS c, i, v FROM ev WHERE vec_id < {k})",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""d{it} AS (SELECT ev.vec_id, {prev}.c,
               floor(sum((ev.v - {prev}.v)*(ev.v - {prev}.v))*1000000 + 0.5)/1000000 AS d
               FROM ev JOIN {prev} USING (i) GROUP BY ev.vec_id, {prev}.c)"""
        )
        ctes.append(
            f"""a{it} AS (SELECT vec_id, c FROM (
                 SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
                 FROM d{it}) WHERE rn = 1)"""
        )
        if it < iters:
            ctes.append(
                f"""c{it} AS (SELECT a{it}.c, ev.i, sum(ev.v)/count(*) AS v
                   FROM ev JOIN a{it} USING (vec_id) GROUP BY a{it}.c, ev.i)"""
            )
            prev = f"c{it}"
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT c AS cluster, CAST(count(*) AS BIGINT) AS n
    FROM a{iters} GROUP BY c
    """


@q("kmeans_cluster_sizes", _kmeans_oracle_sql(K_CLUSTERS, K_ITERS))
def kmeans_cluster_sizes(sf_dir: str):
    """ClusteringComponent analog: per-cluster document counts after
    {K_ITERS} distributed Lloyd iterations (k={K_CLUSTERS}, deterministic
    smallest-vec_id init). The oracle unrolls the same iterations in SQL;
    centroid recompute is sum/count in DOUBLE on both sides."""
    import ray

    labels, C = kmeans_fit(sf_dir)
    cref = ray.put(C)
    state: dict = {}

    def final_assign(t: pa.Table) -> pa.Table:
        if "C" not in state:
            state["C"] = ray.get(cref)
        if t.num_rows == 0:
            kk0 = len(state["C"])
            return pa.table(
                {
                    "cluster": pa.array(np.arange(kk0, dtype=np.int64)),
                    "n": pa.array(np.zeros(kk0, dtype=np.int64)),
                }
            )
        E = _emb_matrix(t)
        a = _assign(E, state["C"])
        kk = len(state["C"])
        cnt = np.bincount(a, minlength=kk).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                "n": pa.array(cnt),
            }
        )

    ds = load(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(final_assign, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n"))
    )

    def relabel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater(t.column("n"), 0))  # oracle omits empty clusters
        cl = t.column("cluster").to_numpy()
        return pa.table(
            {
                "cluster": pa.array(labels[cl], pa.int64()),
                "n": t.column("n").cast(pa.int64()),
            }
        )

    return out.map_batches(relabel, batch_format="pyarrow")
