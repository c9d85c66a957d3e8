#!/usr/bin/env python
"""`ray job submit`-able SQL runner over the standard parquet tables —
the CLI face of the SQL front-end (apache___solr_ray.sql; the reference's
`/sql` handler, solr/modules/sql).

    ray job submit --working-dir . -- \
        python jobs/sql_job.py --sf-dir /data/sf1 \
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type"

In this sandbox it runs standalone (auto `ray.init` local). Results
stream: `--out DIR` writes partitioned parquet via the resumable sink;
without it the first `--head N` rows print as a table.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sql", help="SELECT ... over region/nation/customer/supplier/part/orders/lineitem/events/documents/embeddings")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="write full result as parquet under this dir")
    ap.add_argument("--head", type=int, default=20)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)
    from apache___solr_ray.sql import sql_query

    ds = sql_query(args.sf_dir, args.sql)
    if args.out:
        ds.write_parquet(args.out)
        print(f"wrote {args.out}")
    else:
        print(ds.limit(args.head).to_pandas().to_string())
    ray.shutdown()


if __name__ == "__main__":
    main()
