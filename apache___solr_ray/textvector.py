"""Text-to-vector — the language-models module analog.

Reference surface (solr/modules/language-models/src/java/org/apache/solr/
languagemodels/textvectorisation/):

- ``model/SolrTextToVectorModel.java`` — a named model wrapping
  ``vectorise(text) -> float[]``.
- ``update/processor/TextToVectorUpdateProcessor.java:61-87`` — the ingest
  URP: reads ``inputField``, writes the embedding to ``outputField``;
  a null/empty input or a vectorisation failure leaves the doc unchanged
  (indexing proceeds, the vector field is just absent).
- ``search/TextToVectorQParserPlugin.java`` — embeds the query TEXT with a
  store-registered model, then runs the normal knn vector search.
- ``store/rest/ManagedTextToVectorModelStore.java`` — the persisted
  name -> model registry the URP factory and query parser resolve from.

The reference delegates the actual embedding to an external langchain4j
model (its own tests use ``DummyEmbeddingModel.java``, a constant vector).
Here the bundled model is a REAL deterministic function of the text — the
feature-hashing ("hashing trick", Weinberger et al. 2009, public) bag of
tokens:

    for each analyzer token t:  v[h(t) mod dim] += sign(t)

with ``h(t)`` = first 8 hex chars of md5(t) and ``sign(t)`` = parity of the
9th hex char — chosen precisely so a DuckDB oracle can recompute every
component exactly (md5 + integer arithmetic, no floats), giving the
vectorisation step a full value-hash correctness gate instead of the
rows-only check a black-box model would get. ``normalize=True`` adds the
conventional L2 normalization for cosine-space consumers (float path,
pytest-gated).

Everything is vectorized: tokens are flattened once per batch, unique
tokens are hashed once (md5 over the batch vocabulary, not per
occurrence), and components accumulate with one ``np.add.at`` scatter.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z0-9]+")


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class HashingTextToVectorModel:
    """Feature-hashing text embedding (SolrTextToVectorModel analog).

    ``vectorise_batch(texts)`` returns a dense ``(n_docs, dim)`` matrix:
    int64 token-sign counts when ``normalize=False``, L2-normalized
    float32 when ``normalize=True`` (all-zero rows stay zero).
    """

    def __init__(self, dim: int = 64, normalize: bool = False):
        if dim <= 0:
            raise ValueError("dim must be positive")
        self.dim = int(dim)
        self.normalize = bool(normalize)

    # the spec dict is what the model store persists (ManagedTextToVector-
    # ModelStore stores the model's builder params, not weights)
    def spec(self) -> dict:
        return {"type": "hashing", "dim": self.dim, "normalize": self.normalize}

    @staticmethod
    def from_spec(spec: dict) -> "HashingTextToVectorModel":
        if spec.get("type") != "hashing":
            raise ValueError(f"unknown model type {spec.get('type')!r}")
        return HashingTextToVectorModel(
            dim=int(spec["dim"]), normalize=bool(spec.get("normalize", False))
        )

    @staticmethod
    def _hash_token(tok: str) -> tuple[int, int]:
        h = hashlib.md5(tok.encode()).hexdigest()
        return int(h[:8], 16), (1 if int(h[8], 16) % 2 == 0 else -1)

    def vectorise_batch(self, texts) -> np.ndarray:
        n = len(texts)
        out = np.zeros((n, self.dim), dtype=np.int64)
        # flatten: (doc_idx, token) pairs; hash each UNIQUE token once
        doc_idx: list[int] = []
        codes: list[int] = []
        vocab: dict[str, int] = {}
        for i, txt in enumerate(texts):
            if txt is None:
                continue
            for tok in _TOKEN_RE.findall(str(txt).lower()):
                code = vocab.get(tok)
                if code is None:
                    code = vocab[tok] = len(vocab)
                doc_idx.append(i)
                codes.append(code)
        if not vocab:
            return self._finish(out)
        hs = np.empty(len(vocab), dtype=np.int64)
        sg = np.empty(len(vocab), dtype=np.int64)
        for tok, code in vocab.items():
            h, s = self._hash_token(tok)
            hs[code] = h % self.dim
            sg[code] = s
        di = np.asarray(doc_idx, dtype=np.int64)
        ci = np.asarray(codes, dtype=np.int64)
        np.add.at(out, (di, hs[ci]), sg[ci])
        return self._finish(out)

    def _finish(self, out: np.ndarray) -> np.ndarray:
        if not self.normalize:
            return out
        f = out.astype(np.float32)
        norms = np.linalg.norm(f, axis=1, keepdims=True)
        np.divide(f, norms, out=f, where=norms > 0)
        return f

    def vectorise(self, text: str) -> np.ndarray:
        """Single-text convenience (the reference URP's per-doc call)."""
        return self.vectorise_batch([text])[0]


# ---------------------------------------------------------------------------
# Model store (ManagedTextToVectorModelStore analog): a persisted JSON
# registry of named model specs, resolved by the URP factory and the
# query parser. Atomic tmp+replace write like the other manifests.
# ---------------------------------------------------------------------------


def store_put(store_path: str, name: str, model: HashingTextToVectorModel) -> None:
    models = {}
    if os.path.exists(store_path):
        with open(store_path) as f:
            models = json.load(f)
    models[name] = model.spec()
    os.makedirs(os.path.dirname(store_path) or ".", exist_ok=True)
    tmp = store_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(models, f, sort_keys=True)
    os.replace(tmp, store_path)


def store_get(store_path: str, name: str) -> HashingTextToVectorModel:
    with open(store_path) as f:
        models = json.load(f)
    if name not in models:
        raise KeyError(f"model {name!r} not in store {store_path}")
    return HashingTextToVectorModel.from_spec(models[name])


def store_list(store_path: str) -> list[str]:
    if not os.path.exists(store_path):
        return []
    with open(store_path) as f:
        return sorted(json.load(f))


# ---------------------------------------------------------------------------
# Ingest URP (TextToVectorUpdateProcessor analog) — a stateful actor-pool
# stage: the model is built once per actor in __init__, each batch is one
# vectorized pass. Null/empty input leaves the output null (the reference
# skips the doc's vector field and indexes the rest, :63-66).
# ---------------------------------------------------------------------------


class TextToVectorProcessor:
    def __init__(self, model_spec: dict, input_field: str, output_field: str):
        self.model = HashingTextToVectorModel.from_spec(model_spec)
        self.input_field = input_field
        self.output_field = output_field

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.input_field).to_pylist()
        mat = self.model.vectorise_batch(texts)
        empty = [txt is None or txt == "" for txt in texts]
        typ = pa.float32() if self.model.normalize else pa.int64()
        vecs = pa.array(
            [None if empty[i] else mat[i].tolist() for i in range(len(texts))],
            type=pa.list_(typ),
        )
        return t.append_column(self.output_field, vecs)


def text_to_vector(ds, model: HashingTextToVectorModel, input_field: str,
                   output_field: str, concurrency: int = 4):
    """Attach an embedding column to every row (the ingest-chain stage)."""
    # autoscaling pool with min=1: a FIXED pool of size == cluster CPUs
    # deadlocks small sessions (all CPUs pinned by idle actors, upstream
    # read / downstream shuffle tasks starve) — min 1 always leaves the
    # scheduler room, max still saturates big clusters
    return ds.map_batches(
        TextToVectorProcessor,
        fn_constructor_kwargs={
            "model_spec": model.spec(),
            "input_field": input_field,
            "output_field": output_field,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


# ---------------------------------------------------------------------------
# Query-by-text (TextToVectorQParserPlugin analog): embed the query string
# with a store-resolved model, then score docs by similarity. The integer
# (normalize=False) path scores raw dot products — exactly reproducible in
# SQL; the normalized path is the usual cosine knn.
# ---------------------------------------------------------------------------


def text_to_vector_topk(ds, store_path: str, model_name: str, qtext: str,
                        text_field: str, id_field: str, k: int = 20):
    """Top-k docs by embedding dot product with the embedded query text.

    One vectorized pass: each batch embeds its docs (model in actor
    state), matmuls against the broadcast query vector, and emits
    (id, dot); a small sort+limit finishes. Docs sharing no dimension
    with the query keep dot=0 (they can still appear in the tail) — the
    SQL mirror uses COALESCE over a left join for the same semantics.
    """
    model = store_get(store_path, model_name)
    qv = model.vectorise(qtext)

    class Scorer:
        def __init__(self):
            self.model = HashingTextToVectorModel.from_spec(model.spec())
            self.qv = qv

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = self.model.vectorise_batch(t.column(text_field).to_pylist())
            dots = mat @ self.qv
            return pa.table({id_field: t.column(id_field), "dot": pa.array(dots)})

    # (1, 4): a fixed pool of 4 deadlocks a 4-CPU session — the pool pins
    # every CPU and the Sort downstream never gets a slot
    scored = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=(1, 4))
    return scored.sort(["dot", id_field], descending=[True, False]).limit(k)
