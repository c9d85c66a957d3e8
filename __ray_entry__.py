"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (inverted-index build + BM25 top-k)
over /root/testdata/sf0.001; ``queries()``/``oracle_sql()`` expose the
operator catalog (apache___solr_ray.pipelines) with DuckDB mirrors.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents (term-hash
    shuffle → segments → stats) and serve the reference query set through
    the actor-pool query stage; returns the top-k result table."""
    import ray.data as rd

    from apache___solr_ray.pipelines.indexq import BM25_QUERIES, ensure_doc_index
    from apache___solr_ray.query import TopKQueryActor

    index_dir = ensure_doc_index(SMOKE_SF_DIR)
    qds = rd.from_items(
        [{"qid": i, "query": q, "k": 10} for i, q in enumerate(BM25_QUERIES)]
    )
    return qds.map_batches(
        TopKQueryActor,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (relational, text/dedup, similarity, and index-backed queries)."""
    from apache___solr_ray.pipelines import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops — MinHash/SimHash/BM25 float32 scoring/LSH — which get the weaker
    rows-only check; their exactness is pytest-asserted instead)."""
    from apache___solr_ray.pipelines import all_oracles

    return all_oracles()
