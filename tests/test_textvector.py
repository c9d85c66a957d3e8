"""Text-to-vector (language-models module analog) + scripting/collation URPs.

Reference surfaces: TextToVectorUpdateProcessor.java (null/empty input
skipped), ManagedTextToVectorModelStore.java (named model registry),
TextToVectorQParserPlugin.java (embed query text then knn),
ScriptUpdateProcessorFactory.java (per-doc script, return-false drops),
ICUCollationField.java (strength=primary folds case+accents).
"""

import numpy as np
import pyarrow as pa
import pytest

from apache___solr_ray.textvector import (
    HashingTextToVectorModel,
    TextToVectorProcessor,
    store_get,
    store_list,
    store_put,
)


def test_vectorise_batch_matches_single():
    m = HashingTextToVectorModel(dim=32)
    texts = ["the quick brown fox", "hash join order", "", "the the the"]
    mat = m.vectorise_batch(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(mat[i], m.vectorise(t))
    # deterministic across instances
    assert np.array_equal(mat, HashingTextToVectorModel(dim=32).vectorise_batch(texts))


def test_vectorise_counts_token_multiplicity():
    m = HashingTextToVectorModel(dim=16)
    one = m.vectorise("spark")
    three = m.vectorise("spark spark spark")
    assert np.array_equal(three, one * 3)
    assert np.abs(one).sum() == 1  # single token -> single ±1 component


def test_normalized_path_unit_norm():
    m = HashingTextToVectorModel(dim=32, normalize=True)
    mat = m.vectorise_batch(["alpha beta gamma", ""])
    assert mat.dtype == np.float32
    assert np.isclose(np.linalg.norm(mat[0]), 1.0, atol=1e-6)
    assert np.linalg.norm(mat[1]) == 0.0  # all-zero row stays zero


def test_urp_null_and_empty_input_yield_null_vector():
    # reference TextToVectorUpdateProcessor.java:63-66 — missing/empty
    # input leaves the doc without a vector field, indexing proceeds
    p = TextToVectorProcessor(
        {"type": "hashing", "dim": 8, "normalize": False}, "text", "vector"
    )
    t = pa.table({"doc_id": [1, 2, 3], "text": ["a b", None, ""]})
    out = p(t)
    vecs = out.column("vector").to_pylist()
    assert vecs[0] is not None and len(vecs[0]) == 8
    assert vecs[1] is None and vecs[2] is None
    assert out.column("doc_id").to_pylist() == [1, 2, 3]


def test_model_store_roundtrip(tmp_path):
    store = str(tmp_path / "models.json")
    store_put(store, "m8", HashingTextToVectorModel(dim=8))
    store_put(store, "m32n", HashingTextToVectorModel(dim=32, normalize=True))
    assert store_list(store) == ["m32n", "m8"]
    m = store_get(store, "m32n")
    assert m.dim == 32 and m.normalize is True
    with pytest.raises(KeyError):
        store_get(store, "nope")
    with pytest.raises(ValueError):
        HashingTextToVectorModel.from_spec({"type": "transformer", "dim": 8})


def test_script_processor_mutate_and_drop():
    from apache___solr_ray.stages.urp import script_processor

    def script(doc):
        if doc["n"] < 0:
            return None  # "return false" drops the doc
        return {"id": doc["id"], "n2": doc["n"] * 2}

    run = script_processor(script)
    out = run(pa.table({"id": [1, 2, 3], "n": [5, -1, 7]}))
    assert out.column("id").to_pylist() == [1, 3]
    assert out.column("n2").to_pylist() == [10, 14]
    # every doc dropped -> empty table with the INPUT schema preserved
    allgone = run(pa.table({"id": [9], "n": [-9]}))
    assert allgone.num_rows == 0 and allgone.column_names == ["id", "n"]


def test_collation_key_primary_folds_case_and_accents():
    from apache___solr_ray.stages.urp import collation_key

    t = pa.table({"name": ["Café", "cafe", "CAFE", "Zürich", "zurich", None]})
    out = collation_key("name", "key", strength="primary")(t)
    keys = out.column("key").to_pylist()
    assert keys[0] == keys[1] == keys[2] == "cafe"
    assert keys[3] == keys[4] == "zurich"
    assert keys[5] is None
    # secondary strength keeps accents, folds case only
    out2 = collation_key("name", "key", strength="secondary")(t)
    k2 = out2.column("key").to_pylist()
    assert k2[0] == "café" and k2[3] == "zürich"
    with pytest.raises(ValueError):
        collation_key("name", "key", strength="tertiary")


def test_text_to_vector_topk_ranks_query_overlap(ray_session, tmp_path):
    import ray.data as rd

    from apache___solr_ray.textvector import text_to_vector_topk

    store = str(tmp_path / "models.json")
    store_put(store, "m", HashingTextToVectorModel(dim=64))
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "hash join order sort"},
            {"doc_id": 2, "text": "hash join"},
            {"doc_id": 3, "text": "completely unrelated words here"},
        ]
    )
    out = text_to_vector_topk(
        docs, store, "m", "hash join order sort", "text", "doc_id", k=3
    ).to_pandas()
    assert out["doc_id"].tolist()[0] == 1  # full overlap wins
    assert out["dot"].iloc[0] == 4
    d3 = out[out["doc_id"] == 3]["dot"].iloc[0]
    assert d3 <= out["dot"].iloc[1]
