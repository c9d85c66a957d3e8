"""Pipelines: the engine's operator surface expressed as named queries.

Each submodule exposes ``QUERIES: dict[name, callable(sf_dir)]`` and
``ORACLE: dict[name, sql]`` (ANSI SQL for DuckDB over the same Parquet
tables). Names and output column names match exactly between the two —
that is the driver's correctness contract.

- ``relational``  — joins / rollups / facets / sorts / set ops / windows
                    (streaming-expression + JSON-facet analogs, SURVEY §2.4-2.6)
- ``text``        — tokenization, dedup signatures, quality, fingerprints
                    (URP + signature analogs, SURVEY §2.2, §2.7)
- ``similarity``  — embedding ANN / near-dup (knn/vectorSimilarity analogs)
- ``indexq``      — queries answered FROM the built inverted index
                    (df/postings dumps, BM25 top-k)
- ``graph``       — gatherNodes / shortestPath traversals (solrj-streaming
                    graph expressions, SURVEY §2.4)
"""

from apache___solr_ray.pipelines import cluster, graph, indexq, lmq, relational, schemaq, similarity, sqlq, streamq, text  # noqa: F401

_MODULES = (relational, text, similarity, indexq, graph, cluster, sqlq, streamq, schemaq, lmq)


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
