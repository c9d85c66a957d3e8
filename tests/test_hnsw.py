"""Per-segment NSW (HNSW-family) ANN: recall >=0.9 at the probe budget
where the IVF gate is 0.6 (nprobe=4/8 == half the corpus scanned); build
is persisted + resumable and absent from query time."""

import os

import numpy as np
import pyarrow.compute as pc

from apache___solr_ray.hnsw import build_hnsw_index, hnsw_topk
from apache___solr_ray.manifest import read_json
from apache___solr_ray.sources import load_arrow

SF = "/root/testdata/sf0.01"


def _brute_top(sf_dir, qv, k, exclude_id):
    t = load_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    X = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
    cos = (X @ qv) / np.maximum(1e-300, np.linalg.norm(X, axis=1) * np.linalg.norm(qv))
    keep = ids != exclude_id
    ids, cos = ids[keep], cos[keep]
    order = np.lexsort((ids, -cos))[:k]
    return set(int(i) for i in ids[order])


def _qv(sf_dir):
    t = load_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    row = t.filter(pc.equal(t.column("vec_id"), 0))
    return np.asarray(row.column("embedding")[0].as_py(), dtype=np.float64)


def _index(tmp_path_factory):
    d = str(tmp_path_factory.getbasetemp() / "hnsw_sf001")
    build_hnsw_index(
        os.path.join(SF, "embeddings.parquet"), d, n_segments=4
    )
    return d


def test_hnsw_recall_on_corpus(ray_session, tmp_path_factory):
    """sf0.01 corpus (500 vecs): recall gate 0.9 — same query/corpus where
    the IVF gate is 0.6 (tests/test_similarity.py). At this toy size the
    beam covers most of each 125-node segment; the probe-budget gate runs
    at n=4000 below, where the fraction is meaningful."""
    d = _index(tmp_path_factory)
    qv = _qv(SF)
    want = _brute_top(SF, qv, 20, exclude_id=0)
    got = hnsw_topk(d, qv, k=20, ef_search=96, exclude_id=0)
    ids = got.column("vec_id").to_pylist()
    recall = len(set(ids) & want) / len(want)
    assert recall >= 0.9, f"NSW recall {recall} below 0.9 gate"
    assert got.column("cos").to_pylist() == sorted(
        got.column("cos").to_pylist(), reverse=True
    )


def test_hnsw_budget_at_scale(ray_session, tmp_path_factory):
    """n=4000 synthetic corpus: recall >=0.9 while the beam visits <=50%
    of the nodes (the IVF nprobe=4/8 budget) — measured 1.00 recall at 29%
    visited with ef_search=32."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("hnsw_scale")
    rng = np.random.Generator(np.random.PCG64(7))
    n, dim = 4000, 32
    X = rng.normal(size=(n, dim)).astype(np.float32)
    src = str(base / "embeddings.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
            }
        ),
        src,
    )
    idx = str(base / "idx")
    build_hnsw_index(src, idx, n_segments=4)
    qv = X[0].astype(np.float64)
    cos = (X.astype(np.float64) @ qv) / (
        np.linalg.norm(X, axis=1) * np.linalg.norm(qv)
    )
    ids = np.arange(n)
    keep = ids != 0
    order = np.lexsort((ids[keep], -cos[keep]))[:20]
    want = set(int(i) for i in ids[keep][order])
    got, visited, total = hnsw_topk(
        idx, qv, k=20, ef_search=32, exclude_id=0, with_stats=True
    )
    recall = len(set(got.column("vec_id").to_pylist()) & want) / 20
    assert recall >= 0.9, f"recall {recall}"
    assert visited <= 0.5 * total, (visited, total)


def test_hnsw_recall_grows_with_ef(ray_session, tmp_path_factory):
    d = _index(tmp_path_factory)
    qv = _qv(SF)
    want = _brute_top(SF, qv, 20, exclude_id=0)
    recalls = {}
    for ef in (8, 96):
        got = hnsw_topk(d, qv, k=20, ef_search=ef, exclude_id=0)
        recalls[ef] = len(set(got.column("vec_id").to_pylist()) & want) / len(want)
    assert recalls[8] <= recalls[96]


def test_hnsw_build_resumes(ray_session, tmp_path_factory):
    d = _index(tmp_path_factory)
    man1 = read_json(os.path.join(d, "hnsw_manifest.json"))
    # second build short-circuits on the committed manifest (identity dict)
    man2 = build_hnsw_index(os.path.join(SF, "embeddings.parquet"), d, n_segments=4)
    assert man1 == man2
    assert sum(int(v) for v in man1["seg_counts"].values()) == 500
