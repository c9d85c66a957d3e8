"""ANN quality gates — mechanism-honest on this mildly-clustered synthetic
embedding space (64-dim; top-20 cosine 0.24-0.37 vs corpus median 0.01):

- IVF nprobe=4 of 8 lists scans ~50% of vectors -> random-pruning baseline
  recall = 0.50; the gate (0.6) requires the quantizer to beat random.
- LSH 8-bit hyperplane signatures with Hamming<=1 probing keeps ~9/256 =
  3.5% of vectors -> random baseline 0.035; the gate (0.08) requires >2x
  random. (On strongly clustered real embeddings both recalls rise; the
  tests pin the MECHANISM, not a data-dependent constant.)

Both variants must score their candidates EXACTLY (re-rank correctness).
"""

import numpy as np


def _brute(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = t.column("vec_id").to_numpy()
    qv = X[ids.tolist().index(0)]
    cos = (X @ qv) / (np.linalg.norm(X, axis=1) * np.linalg.norm(qv) + 1e-300)
    return ids, cos


def _top20(ids, cos):
    order = np.lexsort((ids, -cos))
    return [int(ids[i]) for i in order if ids[i] != 0][:20]


def test_ivf_recall_and_exact_rerank(ray_session):
    from apache___solr_ray.pipelines.similarity import QUERIES

    sf = "/root/testdata/sf0.01"
    ids, cos = _brute(sf)
    want = set(_top20(ids, cos))
    res = QUERIES["ann_ivf_top20"](sf)
    got_ids = res.column("vec_id").to_pylist()
    recall = len(set(got_ids) & want) / len(want)
    assert recall >= 0.6, f"IVF nprobe=4/8 recall {recall} (random baseline 0.5)"
    # exact re-rank: every candidate's cosine matches brute force
    lut = {int(i): c for i, c in zip(ids, cos)}
    for vid, c in zip(got_ids, res.column("cos").to_pylist()):
        assert abs(c - round(lut[vid], 6)) < 1e-9, vid


def test_lsh_recall_and_exact_rerank(ray_session):
    from apache___solr_ray.pipelines.similarity import QUERIES

    sf = "/root/testdata/sf0.01"
    ids, cos = _brute(sf)
    want = set(_top20(ids, cos))
    res = QUERIES["ann_lsh_bucketed_top20"](sf).to_pandas()
    recall = len(set(res["vec_id"]) & want) / len(want)
    assert recall >= 0.08, f"LSH recall {recall} (random baseline 0.035)"
    lut = {int(i): c for i, c in zip(ids, cos)}
    for vid, s in zip(res["vec_id"], res["sim"]):
        assert abs(s - round(lut[int(vid)], 5)) < 1e-9, vid
