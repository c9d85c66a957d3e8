"""Training-mix quota sampler + SemDeDup-style semantic dedup invariants."""

import numpy as np
import pandas as pd


def test_training_mix_respects_quota(ray_session):
    from apache___solr_ray.pipelines.text import QUERIES

    df = QUERIES["training_mix_quota_sample"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    for src, g in df.groupby("source"):
        total = g["n_tokens"].sum()
        # budget may overshoot by at most the LAST kept doc (prior < quota)
        assert total - g["n_tokens"].max() < 600, src
    # deterministic: second run identical
    df2 = QUERIES["training_mix_quota_sample"]("/root/testdata/sf0.001").to_pandas()
    a = df.sort_values("doc_id").reset_index(drop=True)
    b = df2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_semantic_dedup_keepers_partition_corpus(ray_session):
    from apache___solr_ray.pipelines.similarity import QUERIES

    df = QUERIES["semantic_dedup_keepers"]("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq

    n = pq.ParquetFile("/root/testdata/sf0.001/embeddings.parquet").metadata.num_rows
    # groups partition the corpus: sizes sum to n, keepers are distinct
    assert df["group_size"].sum() == n
    assert df["keeper"].is_unique
    # keeper is the MIN id of its group, so every keeper id is a real vec_id
    ids = set(
        pq.read_table(
            "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id"]
        ).column("vec_id").to_pylist()
    )
    assert set(df["keeper"]).issubset(ids)


def test_semantic_dedup_groups_within_clusters_only(ray_session):
    """Pairs across different labels must never merge groups: plant two
    identical vectors in different labels — they stay separate keepers."""
    import ray.data as rd
    import pyarrow as pa
    from apache___solr_ray.pipelines.common import grouped_map

    # reproduce the entry's pair stage on a controlled fixture
    v = [1.0, 0.0, 0.0, 0.0]
    rows = [
        {"vec_id": 1, "embedding": v, "label": 0},
        {"vec_id": 2, "embedding": v, "label": 0},  # same cluster: pair
        {"vec_id": 3, "embedding": v, "label": 1},  # other cluster: no pair
    ]
    ds = rd.from_items(rows)

    def pairs_in_clusters(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("label", sort=False):
            if len(g) < 2:
                continue
            ids = np.sort(g["vec_id"].to_numpy())
            E = np.array(g.sort_values("vec_id")["embedding"].tolist())
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sims = En @ En.T
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = sims[iu, ju] >= 0.4
            out.append(pd.DataFrame({"a": ids[iu[hit]], "b": ids[ju[hit]]}))
        if not out:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        return pd.concat(out)

    pairs = grouped_map(ds, "label", pairs_in_clusters).to_pandas()
    assert set(map(tuple, pairs[["a", "b"]].to_numpy())) == {(1, 2)}
