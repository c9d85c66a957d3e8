"""Index-side MinHash similarity (MinHashQParser analog): the persisted
sidecar probe must equal brute-force exact Jaccard, resume on the
committed manifest, and read only probed partitions."""

import os

import numpy as np

from apache___solr_ray.manifest import read_json
from apache___solr_ray.minhash_index import build_minhash_sidecar, minhash_similar
from apache___solr_ray.sources import load_arrow
from apache___solr_ray.stages.dedup import MinHasher

SF = "/root/testdata/sf0.001"
DOC = 8


def _sidecar(tmp_path_factory):
    d = str(tmp_path_factory.getbasetemp() / "mh_sidecar")
    build_minhash_sidecar(os.path.join(SF, "documents.parquet"), d)
    return d


def _brute(sf_dir, query_doc, num, den):
    t = load_arrow(sf_dir, "documents", columns=["doc_id", "text"])
    mh = MinHasher(64, 3)
    sets = {
        int(i): mh.shingles(x)
        for i, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    q = sets[query_doc]
    out = []
    for i, s in sets.items():
        if i == query_doc:
            continue
        inter = len(np.intersect1d(s, q, assume_unique=True))
        uni = len(s) + len(q) - inter
        if den * inter >= num * uni:
            out.append((i, inter, uni))
    return sorted(out)


def test_minhash_probe_equals_brute(ray_session, tmp_path_factory):
    d = _sidecar(tmp_path_factory)
    got = minhash_similar(d, DOC, 9, 10)
    rows = sorted(
        zip(
            got.column("doc_id").to_pylist(),
            got.column("inter").to_pylist(),
            got.column("uni").to_pylist(),
        )
    )
    assert rows == _brute(SF, DOC, 9, 10)
    assert len(rows) >= 1  # doc 8 has a >=0.9 neighbor in this corpus


def test_minhash_sidecar_resumes(ray_session, tmp_path_factory):
    d = _sidecar(tmp_path_factory)
    man1 = read_json(os.path.join(d, "minhash_manifest.json"))
    man2 = build_minhash_sidecar(os.path.join(SF, "documents.parquet"), d)
    assert man1 == man2


def test_minhash_unknown_doc_is_empty(ray_session, tmp_path_factory):
    d = _sidecar(tmp_path_factory)
    got = minhash_similar(d, 10_000_000, 9, 10)
    assert got.num_rows == 0
