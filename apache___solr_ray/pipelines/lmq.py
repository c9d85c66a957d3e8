"""Language-models / scripting / analysis-extras module entries.

Covers the last reference modules without a catalog surface:

- ``solr/modules/language-models`` (textvectorisation): ingest-time
  text->vector URP, the managed model store, and query-by-text knn —
  ``apache___solr_ray.textvector``. The bundled model is feature hashing
  over md5, so the DuckDB oracle recomputes every vector component
  EXACTLY (integer arithmetic, no float hash risk).
- ``solr/modules/scripting`` (ScriptUpdateProcessorFactory.java): a user
  script mutating/dropping docs at ingest — ``stages.urp.script_processor``.
- ``solr/modules/analysis-extras`` (ICUCollationField.java): locale-fold
  collation sort keys — ``stages.urp.collation_key``.
"""

from __future__ import annotations

import os

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


_DIM = 64

# the md5 feature-hash mirror: dimension and sign per token, in SQL
_HASH_SQL = f"""
  SELECT doc_id,
         (('0x' || substr(md5(tok), 1, 8))::UBIGINT % {_DIM})::BIGINT AS vdim,
         CASE WHEN ('0x' || substr(md5(tok), 9, 1))::UBIGINT % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              x -> x <> '')) AS tok
    FROM documents
  )
"""


@q(
    "text_to_vector_components",
    f"""
    WITH hashed AS ({_HASH_SQL})
    SELECT doc_id, vdim, SUM(sgn)::BIGINT AS weight
    FROM hashed GROUP BY doc_id, vdim HAVING SUM(sgn) <> 0
    ORDER BY doc_id, vdim
    """,
)
def text_to_vector_components(sf_dir: str):
    """TextToVectorUpdateProcessor vectorisation, value-checked to the
    last integer: every document's feature-hash embedding, exploded to
    (doc_id, vdim, weight) rows so the md5-in-SQL oracle hash-matches
    each nonzero component (reference TextToVectorUpdateProcessor.java:
    61-87 sets outputField = model.vectorise(inputField))."""
    from apache___solr_ray.textvector import HashingTextToVectorModel, text_to_vector

    ds = load(sf_dir, "documents", columns=["doc_id", "text"])
    model = HashingTextToVectorModel(dim=_DIM, normalize=False)
    vds = text_to_vector(ds, model, "text", "vector")

    def explode(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy()
        mat = np.asarray(t.column("vector").to_pylist(), dtype=np.int64)
        if mat.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "vdim": pa.array([], pa.int64()),
                 "weight": pa.array([], pa.int64())}
            )
        di, vd = np.nonzero(mat)
        return pa.table(
            {"doc_id": pa.array(ids[di]), "vdim": pa.array(vd.astype(np.int64)),
             "weight": pa.array(mat[di, vd])}
        )

    return vds.map_batches(explode, batch_format="pyarrow")


_QTEXT = "fast hash join order sort"


@q(
    "text_to_vector_knn",
    f"""
    WITH hashed AS ({_HASH_SQL}),
    dv AS (
      SELECT doc_id, vdim, SUM(sgn)::BIGINT AS weight
      FROM hashed GROUP BY doc_id, vdim
    ),
    qtok AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower('{_QTEXT}'),
                                '[^a-z0-9]+'), x -> x <> '')) AS tok
    ),
    qv AS (
      SELECT (('0x' || substr(md5(tok), 1, 8))::UBIGINT % {_DIM})::BIGINT AS vdim,
             SUM(CASE WHEN ('0x' || substr(md5(tok), 9, 1))::UBIGINT % 2 = 0
                      THEN 1 ELSE -1 END)::BIGINT AS qw
      FROM qtok GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(SUM(dv.weight * qv.qw), 0)::BIGINT AS dot
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN dv ON dv.doc_id = d.doc_id
    LEFT JOIN qv ON qv.vdim = dv.vdim
    GROUP BY d.doc_id
    ORDER BY dot DESC, d.doc_id
    LIMIT 20
    """,
)
def text_to_vector_knn(sf_dir: str):
    """TextToVectorQParserPlugin analog end to end: the model is saved to
    and resolved FROM the managed store (ManagedTextToVectorModelStore
    analog), the query TEXT is embedded with it, and docs are ranked by
    embedding dot product — integers throughout, so the SQL mirror
    reproduces the exact top-20 (ties broken by doc_id both sides)."""
    from apache___solr_ray.textvector import (
        HashingTextToVectorModel,
        store_put,
        text_to_vector_topk,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    store = f"/tmp/apache___solr_ray_cache/t2v_models_{tag}.json"
    store_put(store, "hash64", HashingTextToVectorModel(dim=_DIM, normalize=False))
    ds = load(sf_dir, "documents", columns=["doc_id", "text"])
    return text_to_vector_topk(ds, store, "hash64", _QTEXT, "text", "doc_id", k=20)


@q(
    "script_urp_docs",
    """
    SELECT doc_id, upper(lang) AS lang_uc, length(text) AS text_len
    FROM documents
    WHERE n_chars >= 40
    ORDER BY doc_id
    """,
)
def script_urp_docs(sf_dir: str):
    """ScriptUpdateProcessor analog: a user 'script' (Python callable)
    runs per doc — drops short docs (return false semantics), uppercases
    lang and derives text_len (reference ScriptUpdateProcessorFactory.java
    processAdd dispatch)."""
    from apache___solr_ray.stages.urp import script_processor

    def script(doc: dict):
        if doc["n_chars"] < 40:
            return None
        return {
            "doc_id": doc["doc_id"],
            "lang_uc": doc["lang"].upper(),
            "text_len": len(doc["text"]),
        }

    ds = load(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])
    return ds.map_batches(script_processor(script), batch_format="pyarrow").sort("doc_id")


@q(
    "collation_sorted_sources",
    """
    SELECT source, lower(strip_accents(source)) AS sort_key, n
    FROM (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source)
    ORDER BY sort_key, source
    """,
)
def collation_sorted_sources(sf_dir: str):
    """ICUCollationField analog: primary-strength collation keys (accent
    fold + casefold) attached per group and used as the sort key —
    the oracle recomputes the key with DuckDB's lower(strip_accents())
    (reference ICUCollationField.java; analysis-extras module)."""
    from apache___solr_ray.pipelines.common import partial_sum_count
    from apache___solr_ray.stages.urp import collation_key

    ds = load(sf_dir, "documents", columns=["source"])
    counts = partial_sum_count(ds, keys=["source"], sum_cols=[], count_alias="n")
    keyed = counts.map_batches(
        collation_key("source", "sort_key", strength="primary"),
        batch_format="pyarrow",
    )
    return keyed.sort(["sort_key", "source"]).map_batches(
        lambda t: t.select(["source", "sort_key", "n"]), batch_format="pyarrow"
    )
