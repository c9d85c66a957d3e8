"""Scale-path dedup parity: the LSH candidate->verify->propagate pipeline
must produce exactly the brute-force results at test scale (the brute pair
stage is the oracle; the LSH path is what runs at 100 TB). Similarity is
3-gram-shingle Jaccard on both sides (the near_dup_components metric)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _pairs_set(tbl):
    return set(zip(tbl.column("a").to_pylist(), tbl.column("b").to_pylist()))


@pytest.fixture(scope="module")
def brute_pairs(ray_session):
    from apache___solr_ray.sources import load
    from apache___solr_ray.stages.dedup import jaccard_pairs_exact

    ds = load(SF, "documents", columns=["doc_id", "text"])
    import pyarrow as pa
    import ray

    refs = jaccard_pairs_exact(ds, "text", "doc_id", 9, 10, shingle=3).to_arrow_refs()
    return pa.concat_tables([ray.get(r) for r in refs])


@pytest.fixture(scope="module")
def lsh_pairs(ray_session):
    from apache___solr_ray.sources import load
    from apache___solr_ray.stages.dedup import lsh_verified_pairs, token_hash_ds

    ds = load(SF, "documents", columns=["doc_id", "text"])
    toks = token_hash_ds(load(SF, "documents", columns=["doc_id", "text"]), "text", "doc_id", shingle=3)
    import pyarrow as pa
    import ray

    refs = lsh_verified_pairs(ds, toks, "text", "doc_id", 9, 10, shingle=3).to_arrow_refs()
    return pa.concat_tables([ray.get(r) for r in refs])


@pytest.fixture(scope="module")
def fused_pairs(ray_session):
    """The default single-pass path (tok_ds=None): one tokenization feeds
    band keys + verify payload via the materialized checkpoint."""
    from apache___solr_ray.sources import load
    from apache___solr_ray.stages.dedup import lsh_verified_pairs

    ds = load(SF, "documents", columns=["doc_id", "text"])
    import pyarrow as pa
    import ray

    refs = lsh_verified_pairs(ds, None, "text", "doc_id", 9, 10, shingle=3).to_arrow_refs()
    return pa.concat_tables([ray.get(r) for r in refs])


def test_fused_pairs_equal_brute(brute_pairs, fused_pairs):
    assert _pairs_set(fused_pairs) == _pairs_set(brute_pairs)
    b = {(r["a"], r["b"]): (r["n_inter"], r["n_union"]) for r in brute_pairs.to_pylist()}
    for r in fused_pairs.to_pylist():
        assert b[(r["a"], r["b"])] == (r["n_inter"], r["n_union"])


def test_lsh_pairs_equal_brute(brute_pairs, lsh_pairs):
    assert _pairs_set(lsh_pairs) == _pairs_set(brute_pairs)
    # and the exact intersection/union counts agree pairwise
    b = {(r["a"], r["b"]): (r["n_inter"], r["n_union"]) for r in brute_pairs.to_pylist()}
    for r in lsh_pairs.to_pylist():
        assert b[(r["a"], r["b"])] == (r["n_inter"], r["n_union"])


def test_components_equal_union_find(ray_session, brute_pairs):
    """Distributed min-label propagation == driver union-find over the same
    edges (smallest-id representative)."""
    from apache___solr_ray.pipelines.text import connected_components_ds
    from apache___solr_ray.sources import load

    import ray.data as rd

    nodes = load(SF, "documents", columns=["doc_id"])
    ids = sorted(r["doc_id"] for r in nodes.take_all())

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _pairs_set(brute_pairs):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in ids}

    labels = connected_components_ds(
        rd.from_arrow(brute_pairs), load(SF, "documents", columns=["doc_id"])
    )
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == want


# -- embedding near-dup: bucketed (ball-cover IVF) plan parity + guards ------


def _embed_df(res):
    import pandas as pd

    df = res.to_pandas()
    if df.empty and "a" not in df.columns:  # Ray to_pandas drops schema on all-empty
        df = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    return df.sort_values(["a", "b"]).reset_index(drop=True)


@pytest.mark.parametrize("threshold", [0.4, 0.45, 0.9])
def test_embedding_bucketed_equals_allpairs(ray_session, threshold):
    """The exact ball-cover bucketed plan must emit EXACTLY the brute
    block-pair plan's pair set (it is exact by the triangle-inequality
    cover rule, not approximately-recalled)."""
    from apache___solr_ray.sources import load
    from apache___solr_ray.stages.dedup import embedding_near_dup_pairs

    ds = load(SF, "embeddings", columns=["vec_id", "embedding"])
    brute = _embed_df(
        embedding_near_dup_pairs(ds, "embedding", "vec_id", threshold, mode="allpairs")
    )
    bucketed = _embed_df(
        embedding_near_dup_pairs(ds, "embedding", "vec_id", threshold, mode="bucketed")
    )
    auto = _embed_df(embedding_near_dup_pairs(ds, "embedding", "vec_id", threshold))
    assert bucketed.equals(brute)
    assert auto.equals(brute)


def test_embedding_allpairs_guard(ray_session, monkeypatch):
    """Forcing the O(n^2) plan above the row guard must refuse, not run."""
    import apache___solr_ray.stages.dedup as dd
    from apache___solr_ray.sources import load

    ds = load(SF, "embeddings", columns=["vec_id", "embedding"])
    monkeypatch.setattr(dd, "EMBED_ALLPAIRS_MAX", 10)
    with pytest.raises(ValueError, match="EMBED_ALLPAIRS_MAX"):
        dd.embedding_near_dup_pairs(ds, "embedding", "vec_id", 0.4, mode="allpairs")


def test_jaccard_exact_guard(ray_session, monkeypatch):
    """jaccard_pairs_exact refuses above JACCARD_EXACT_MAX and points to
    the LSH scale path."""
    import apache___solr_ray.stages.dedup as dd
    from apache___solr_ray.sources import load

    ds = load(SF, "documents", columns=["doc_id", "text"])
    monkeypatch.setattr(dd, "JACCARD_EXACT_MAX", 5)
    with pytest.raises(ValueError, match="lsh_verified_pairs"):
        dd.jaccard_pairs_exact(ds, "text", "doc_id", 9, 10, shingle=3)


# -- exact-substring (k-gram span) duplication --------------------------------


def _brute_kgram_stats(texts, k):
    """Reference implementation: string grams, corpus-wide counts."""
    from collections import Counter

    from apache___solr_ray.analyze import simple_tokenize

    grams_per_doc = []
    corpus = Counter()
    for t in texts:
        toks = simple_tokenize(t or "")
        g = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        grams_per_doc.append(g)
        corpus.update(g)
    out = {}
    for i, g in enumerate(grams_per_doc):
        if g:
            out[i] = (len(g), sum(1 for x in g if corpus[x] >= 2))
    return out


def test_exact_substring_dup_stats_equals_brute(ray_session):
    import ray

    from apache___solr_ray.stages.dedup import exact_substring_dup_stats

    texts = [
        "a b c d e f g h i j",          # shares the a..h window with doc 2
        "z y x w v u t s",              # unique 8-token doc: 1 window, 0 dup
        "a b c d e f g h zz",           # duplicate of doc 0's first window
        "r r r r r r r r r r r r",      # within-doc repeated window
        "too short",                     # < k tokens: no windows, absent
        "",                              # empty: absent
    ]
    k = 8
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    got = (
        exact_substring_dup_stats(ds, "text", "doc_id", k=k)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _brute_kgram_stats(texts, k)
    assert sorted(got.index) == sorted(want)
    for did, (nw, nd) in want.items():
        assert got.loc[did, "n_windows"] == nw, did
        assert got.loc[did, "n_dup_windows"] == nd, did
    # doc 3 is 12 'r' tokens: 5 windows, all the same gram -> all duplicated
    assert got.loc[3, "n_windows"] == 5 and got.loc[3, "n_dup_windows"] == 5


def test_combine_partials_distributed_fallback_equals_driver(ray_session, monkeypatch):
    """Above PARTIAL_DRIVER_COMBINE_MAX combine_partials takes the
    grouped_map hash-shuffle plan (NOT Ray's sort Aggregate — measured
    430 s at 3.4M partials); force the bound to 0 and assert the plan is
    value-identical to the driver pandas combine, nulls included."""
    import ray
    from ray.data.aggregate import Sum

    from apache___solr_ray.pipelines import common

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 40, n),
            "k2": rng.choice(["a", "b", None], n),
            "v": rng.normal(size=n),
            "w": rng.integers(0, 9, n).astype(float),
        }
    )
    df.loc[df.index % 7 == 0, "v"] = np.nan
    parts = ray.data.from_pandas(df).repartition(8)

    def run():
        return (
            common.combine_partials(
                parts,
                ["k1", "k2"],
                [Sum("v", alias_name="v"), Sum("w", alias_name="w")],
                sum_cols=["v", "w"],
            )
            .to_pandas()
            .sort_values(["k1", "k2"], na_position="last")
            .reset_index(drop=True)
        )

    driver = run()
    monkeypatch.setattr(common, "PARTIAL_DRIVER_COMBINE_MAX", 0)
    dist = run()
    pd.testing.assert_frame_equal(driver, dist, check_like=True)
