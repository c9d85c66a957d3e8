#!/usr/bin/env python
"""`ray job submit`-able training-corpus prep runner — the composed
quality-gate → redact → exact-dedup → accounting pipeline (add
``--decontaminate`` for the benchmark n-gram decontamination stage)
(``pipelines.text.training_corpus_prep``) with a RESUMABLE partitioned
sink: output lands as ``--out/lang=<v>/data.parquet`` with per-partition
manifests, so a re-run after a crash skips finished partitions (pass the
same --out; the fingerprint covers the input listing).

    ray job submit --working-dir . -- \
        python jobs/corpus_prep_job.py --sf-dir /data/sf1 --out /data/prepped

In this sandbox it runs standalone (auto `ray.init` local).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="partitioned parquet output dir")
    ap.add_argument("--head", type=int, default=20)
    ap.add_argument(
        "--decontaminate", action="store_true",
        help="also drop the benchmark slice and n-gram-contaminated docs",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)
    from apache___solr_ray.pipelines.text import (
        training_corpus_prep,
        training_corpus_prep_decontaminated,
    )
    from apache___solr_ray.sinks import write_partitioned

    ds = (
        training_corpus_prep_decontaminated(args.sf_dir)
        if args.decontaminate
        else training_corpus_prep(args.sf_dir)
    )
    if args.out:
        src = os.path.join(args.sf_dir, "documents.parquet")
        fp = f"{src}:{os.path.getsize(src)}"
        res = write_partitioned(ds, args.out, key="lang", fingerprint=fp)
        print(f"written={res['written']} skipped={res['skipped']}")
    else:
        print(ds.limit(args.head).to_pandas().to_string())
    ray.shutdown()


if __name__ == "__main__":
    main()
