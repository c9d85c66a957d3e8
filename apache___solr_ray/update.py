"""Overwrite-by-uniqueKey (upsert) — the reference's
``IndexWriter.updateDocument(Term(uniqueKey), doc)`` path
(``solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:453-530``:
``overwrite`` → updateDocument = atomic delete-old + add-new).

Batch restatement: tombstone the existing doc ids for the incoming urls,
append the new rows as a NEW corpus partition file, and re-run the build —
which resumes every untouched partition (lineage manifests) and only
tokenizes the appended one. Old versions stop matching instantly
(tombstones); a later ``merge_segments(purge_deletes=True)`` reclaims them.
Appended files sort after the original ``pages-*`` files, so existing
part ids — and therefore doc ids and untouched segments — are stable.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from apache___solr_ray.build import IndexConfig, build_index
from apache___solr_ray.deletes import delete_by_url


def upsert_pages(
    corpus_dir: str, index_dir: str, pages: pa.Table, cfg: IndexConfig
) -> dict:
    """Overwrite (or insert) the given pages by url; returns the new
    committed manifest. ``pages`` must carry the corpus schema columns the
    build reads (url, lang, and html or text per cfg.text_from_html)."""
    urls = pages.column("url").to_pylist()
    delete_by_url(index_dir, urls)

    seq = sum(1 for f in os.listdir(corpus_dir) if f.startswith("upsert-"))
    path = os.path.join(corpus_dir, f"upsert-{seq:06d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pages, tmp, row_group_size=2048)
    os.replace(tmp, path)

    return build_index(corpus_dir, index_dir, cfg)
