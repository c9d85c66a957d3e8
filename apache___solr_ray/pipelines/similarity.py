"""Similarity search over the ``embeddings`` table — the knn /
vectorSimilarity parser analogs (reference ``KnnQParserPlugin`` /
``DenseVectorField.java``) as Ray Data pipelines.

Baseline: brute-force cosine top-k (numpy matmul per batch against a
broadcast query matrix). Scale path: LSH-bucketed variant that shuffles
once on bucket id — candidate buckets only — plus the near-dup pair stage
in stages.dedup. All SQL-checked entries compute cosine in float64 like
DuckDB's ``list_cosine_similarity`` (embeddings cast to DOUBLE[] in SQL).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from apache___solr_ray.sources import load, load_arrow
from apache___solr_ray.stages.dedup import embedding_near_dup_pairs

QUERIES: dict = {}
ORACLE: dict = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


_QVEC_SQL = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"


def _query_vec(sf_dir: str) -> np.ndarray:
    t = load_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    row = t.filter(pc.equal(t.column("vec_id"), 0))
    return np.asarray(row.column("embedding")[0].as_py(), dtype=np.float64)


def _sim_stage(qv: np.ndarray):
    """map_batches stage: cosine(embedding, qv) in float64, broadcast qv."""
    import ray

    ref = ray.put(qv)
    state: dict = {}

    def stage(t: pa.Table) -> pa.Table:
        if "q" not in state:
            state["q"] = ray.get(ref)
            state["qn"] = np.linalg.norm(state["q"])
        E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        sims = (E @ state["q"]) / np.maximum(1e-300, np.linalg.norm(E, axis=1) * state["qn"])
        return pa.table({"vec_id": t.column("vec_id"), "sim": pa.array(sims)})

    return stage


@q(
    "ann_cosine_top20",
    f"""
    SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}), 5) AS sim
    FROM embeddings
    ORDER BY list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) DESC, vec_id
    LIMIT 20
    """,
)
def ann_cosine_top20(sf_dir: str):
    """Brute-force cosine top-20 vs a fixed query vector (vec_id 0):
    vectorized scoring per batch, distributed sort+limit for the top-k."""
    qv = _query_vec(sf_dir)
    ds = load(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    scored = ds.map_batches(_sim_stage(qv), batch_format="pyarrow")
    top = scored.sort(["sim", "vec_id"], descending=[True, False]).limit(20)
    from apache___solr_ray.pipelines.common import round_cols

    return round_cols(top, {"sim": 5})


@q(
    "ann_per_label_top3",
    f"""
    WITH s AS (
      SELECT label, vec_id,
             list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) AS sim
      FROM embeddings),
    r AS (
      SELECT label, vec_id,
             row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id) AS rk
      FROM s)
    SELECT label, vec_id, rk FROM r WHERE rk <= 3
    """,
)
def ann_per_label_top3(sf_dir: str):
    """Grouped top-k (per-label nearest) — hash-partition by label, one
    vectorized sort + cumcount per partition; the expand/grouping
    component analog."""
    import ray

    qv = _query_vec(sf_dir)
    qref = ray.put(qv)
    ds = load(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    state: dict = {}

    def score(t: pa.Table) -> pa.Table:
        if "q" not in state:
            state["q"] = ray.get(qref)
            state["qn"] = np.linalg.norm(state["q"])
        E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        sims = (E @ state["q"]) / np.maximum(1e-300, np.linalg.norm(E, axis=1) * state["qn"])
        return pa.table({"label": t.column("label"), "vec_id": t.column("vec_id"), "sim": pa.array(sims)})

    scored = ds.map_batches(score, batch_format="pyarrow")

    from apache___solr_ray.pipelines.common import grouped_map

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True])
        g = g.assign(rk=(g.groupby("label", sort=False).cumcount() + 1).astype(np.int64))
        return g[g["rk"] <= 3][["label", "vec_id", "rk"]]

    return grouped_map(scored, "label", top3)


@q(
    "embedding_near_dup",
    """
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """,
)
def embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (threshold 0.4) via the
    adaptive EXACT planner: ball-cover IVF bucketing when the plan-time
    candidate estimate prunes (the production near-dup regime, threshold
    >= ~0.8 on clustered data), block-pair all-pairs when geometry says no
    metric pruning is possible (this fixture's 0.4 over quasi-random
    vectors). Both plans are exact, so the DuckDB join oracle holds under
    either choice; parity is pytest-asserted per plan."""
    ds = load(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dup_pairs(ds, "embedding", "vec_id", threshold=0.4)


@q(
    "knn_label_vote",
    f"""
    WITH s AS (
      SELECT vec_id, label,
             list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL}) AS sim
      FROM embeddings WHERE vec_id <> 0
      ORDER BY sim DESC, vec_id LIMIT 10)
    SELECT label, count(*) AS n FROM s GROUP BY label
    """,
)
def knn_label_vote(sf_dir: str):
    """kNN classification vote (ClassificationUpdateProcessor knn analog):
    10 nearest neighbours of the query vector, label histogram."""
    from ray.data.aggregate import Count

    qv = _query_vec(sf_dir)
    ds = load(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    import ray

    qref = ray.put(qv)
    state: dict = {}

    def score(t: pa.Table) -> pa.Table:
        if "q" not in state:
            state["q"] = ray.get(qref)
            state["qn"] = np.linalg.norm(state["q"])
        E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        sims = (E @ state["q"]) / np.maximum(1e-300, np.linalg.norm(E, axis=1) * state["qn"])
        out = pa.table(
            {"vec_id": t.column("vec_id"), "label": t.column("label"), "sim": pa.array(sims)}
        )
        return out.filter(pc.not_equal(out.column("vec_id"), 0))

    scored = ds.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["sim", "vec_id"], descending=[True, False]).limit(10)
    return top.groupby("label").aggregate(Count(alias_name="n"))


# -- rows-only: LSH-bucketed ANN (the scale path) ----------------------------


@q("ann_lsh_bucketed_top20")
def ann_lsh_bucketed_top20(sf_dir: str):
    """LSH-bucketed ANN: random-hyperplane signatures bucket the corpus
    (one groupby); only buckets within Hamming distance <= 1 of the query's
    signature are scored. Approximate by design — rows-only check here;
    recall vs the brute-force baseline is asserted in pytest."""
    rng = np.random.Generator(np.random.PCG64(271828))
    qv = _query_vec(sf_dir)
    dim = len(qv)
    planes = rng.normal(size=(8, dim))
    qsig = int("".join("1" if x > 0 else "0" for x in planes @ qv), 2)
    near = {qsig} | {qsig ^ (1 << i) for i in range(8)}

    import ray

    pref = ray.put((planes, near, qv))
    state: dict = {}

    def stage(t: pa.Table) -> pa.Table:
        if "p" not in state:
            state["p"], state["near"], state["q"] = ray.get(pref)
            state["qn"] = np.linalg.norm(state["q"])
        E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        bits = (E @ state["p"].T) > 0
        sigs = np.zeros(len(E), dtype=np.int64)
        for i in range(8):
            sigs |= bits[:, i].astype(np.int64) << (7 - i)
        keep = np.fromiter((int(s) in state["near"] for s in sigs), bool, count=len(sigs))
        if not keep.any():
            return pa.table({"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
        E = E[keep]
        sims = (E @ state["q"]) / np.maximum(1e-300, np.linalg.norm(E, axis=1) * state["qn"])
        return pa.table(
            {
                "vec_id": pc.take(t.column("vec_id"), pa.array(np.flatnonzero(keep))),
                "sim": pa.array(sims),
            }
        )

    ds = load(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    scored = ds.map_batches(stage, batch_format="pyarrow")
    top = scored.sort(["sim", "vec_id"], descending=[True, False]).limit(20)
    from apache___solr_ray.pipelines.common import round_cols

    return round_cols(top, {"sim": 5})


# -- IVF (inverted-file) ANN: the persisted-index scale path -----------------

_IVF_CACHE: dict[str, str] = {}


def ensure_ivf_index(sf_dir: str) -> str:
    """Build (once per corpus, resumable) the persisted IVF index over the
    ``embeddings`` table — centroids + list-partitioned vectors as index
    ARTIFACTS with their own manifest (the DenseVectorField per-segment
    graph analog): the quantizer is trained at BUILD time and absent from
    query time."""
    import hashlib

    from apache___solr_ray.ann import build_ivf_index

    hit = _IVF_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(f"{src}:{os.path.getsize(src)}:ivf1".encode()).hexdigest()[:16]
    index_dir = f"/tmp/apache___solr_ray_cache/{key}/ivf"
    build_ivf_index(src, index_dir, vec_col="embedding", id_col="vec_id", n_lists=8)
    _IVF_CACHE[sf_dir] = index_dir
    return index_dir


# -- HNSW (per-segment navigable-small-world graph): the reference-parity
# -- vector index (Lucene persists an HNSW graph per segment) -----------------

_HNSW_CACHE: dict[str, str] = {}


def ensure_hnsw_index(sf_dir: str) -> str:
    """Build (once per corpus, resumable) the persisted per-segment NSW
    graph index over ``embeddings`` (hnsw.py) — Lucene DenseVectorField
    semantics: the graph is a per-segment index ARTIFACT committed with a
    manifest at build time; query time only searches it."""
    import hashlib

    from apache___solr_ray.hnsw import build_hnsw_index

    hit = _HNSW_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(f"{src}:{os.path.getsize(src)}:hnsw1".encode()).hexdigest()[:16]
    index_dir = f"/tmp/apache___solr_ray_cache/{key}/hnsw"
    build_hnsw_index(src, index_dir, vec_col="embedding", id_col="vec_id", n_segments=4)
    _HNSW_CACHE[sf_dir] = index_dir
    return index_dir


@q("ann_hnsw_top20")  # rows-only for the driver; recall >=0.9 pytest-asserted
def ann_hnsw_top20(sf_dir: str):
    """HNSW-family ANN over the PERSISTED per-segment graph (hnsw.py):
    one Ray task per segment reads only that segment's parquet, beam-
    searches its NSW graph (ef_search=96), driver merges n_segments × k
    winners. Graph construction happens once at build time, never per
    query (recall gate 0.9 vs IVF's 0.6 at the same probe budget —
    tests/test_hnsw.py)."""
    from apache___solr_ray.hnsw import hnsw_topk

    qv = _query_vec(sf_dir)
    index_dir = ensure_hnsw_index(sf_dir)
    top = hnsw_topk(index_dir, qv, k=20, ef_search=96, exclude_id=0)
    cos = pc.round(top.column("cos"), ndigits=6)
    return pa.table({"vec_id": top.column("vec_id"), "cos": cos})


@q("ann_ivf_top20")  # rows-only for the driver; recall pytest-asserted
def ann_ivf_top20(sf_dir: str):
    """IVF ANN over the PERSISTED index (ann.py): probe the nprobe=4
    closest lists, read only those lists' Parquet files (storage pruning),
    per-block exact-cosine top-k inside map_batches, tiny k-way merge of
    the n_blocks × k winners. Centroid training happens once at build
    time, never per query."""
    from apache___solr_ray.ann import ivf_topk

    qv = _query_vec(sf_dir)
    index_dir = ensure_ivf_index(sf_dir)
    top = ivf_topk(index_dir, qv, k=20, nprobe=4, exclude_id=0)
    cos = pc.round(top.column("cos"), ndigits=6)
    return pa.table({"vec_id": top.column("vec_id"), "cos": cos})


@q(
    "semantic_dedup_keepers",
    """
    WITH RECURSIVE e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    edges AS (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    ),
    sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
    reach(node, reach) AS (
      SELECT vec_id, vec_id FROM e
      UNION
      SELECT s.a, r.reach FROM sym s JOIN reach r ON s.b = r.node
    ),
    comp AS (SELECT node, min(reach) AS component FROM reach GROUP BY node)
    SELECT component AS keeper, count(*)::BIGINT AS group_size
    FROM comp GROUP BY component
    ORDER BY keeper
    """,
)
def semantic_dedup_keepers(sf_dir: str):
    """SemDeDup-shape semantic deduplication (Abbas et al. 2023, public:
    cluster embeddings, find near-duplicate pairs ONLY within clusters,
    keep one representative per duplicate group). Cluster assignment here
    is the corpus's precomputed coarse bucket (``label`` — the IVF/k-means
    list id role; ``ensure_ivf_index`` shows the from-scratch training
    path). The quadratic pair scan is confined to single clusters — the
    scale argument of the paper: cluster sizes are bounded, so total cost
    is sum of per-cluster squares, not corpus². Pipeline: one hash
    shuffle on label (``grouped_map``), per-partition vectorized matmul
    over whole groups, distributed min-label components, keeper = min
    vec_id per component (count 1 = unique doc kept trivially)."""
    import ray
    from ray.data.aggregate import Count

    from apache___solr_ray.pipelines.common import grouped_map
    from apache___solr_ray.pipelines.text import connected_components_ds

    ds = load(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def pairs_in_clusters(df: pd.DataFrame) -> pd.DataFrame:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for _, g in df.groupby("label", sort=False):
            if len(g) < 2:
                continue
            ids = g["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            E = np.array(g["embedding"].tolist(), dtype=np.float64)[order]
            En = E / np.maximum(1e-300, np.linalg.norm(E, axis=1, keepdims=True))
            sims = En @ En.T
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = sims[iu, ju] >= 0.4
            out_a.append(ids[iu[hit]])
            out_b.append(ids[ju[hit]])
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        return pd.DataFrame(
            {"a": np.concatenate(out_a).astype(np.int64),
             "b": np.concatenate(out_b).astype(np.int64)}
        )

    pairs = grouped_map(ds, "label", pairs_in_clusters)
    nodes = load(sf_dir, "embeddings", columns=["vec_id"])
    labels = connected_components_ds(pairs, nodes)
    comp = labels.groupby("label").aggregate(Count(alias_name="group_size"))
    return comp.map_batches(
        lambda t: pa.table(
            {"keeper": t.column("label").cast(pa.int64()),
             "group_size": t.column("group_size").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
