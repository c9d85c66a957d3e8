"""Linear-growth evidence run for exact-substring (k-gram span) dedup.

The knob is n (docs): windows grow linearly with corpus tokens, the
gram-hash shuffle rows grow linearly, so wall should grow ~n — unlike the
all-pairs substring compare it replaces (~n^2). Corpus: deterministic
synthetic docs with planted duplicate spans (every 17th doc repeats a
shared 12-token block inside otherwise-unique text), so duplicated-window
counts stay non-trivial at every size.

Usage:  python scripts/ksub_scale.py [n0] [n_doublings]
Result: one JSON line; recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8


def make_corpus(n: int, path: str) -> None:
    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i:04d}" for i in range(5000)])
    shared = " ".join(f"dup{j}" for j in range(12))
    texts = []
    for i in range(n):
        body = " ".join(vocab[rng.integers(0, len(vocab), 40)])
        if i % 17 == 0:
            body = body + " " + shared
        texts.append(body)
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)), "text": texts}),
        path,
    )


def main() -> None:
    n0 = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    doublings = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from apache___solr_ray.stages.dedup import exact_substring_dup_stats

    rows = []
    n = n0
    for step in range(doublings + 1):
        path = f"/tmp/ksub_scale_{n}.parquet"
        if not os.path.exists(path):
            make_corpus(n, path)
        ds = ray.data.read_parquet(path)
        t0 = time.time()
        out = exact_substring_dup_stats(ds, "text", "doc_id", k=K).materialize()
        wall = time.time() - t0
        ndup = int(
            out.sum("n_dup_windows") if out.count() else 0
        )
        exp = (
            round(np.log(wall / rows[-1]["wall_s"]) / np.log(2), 3)
            if rows
            else None
        )
        rows.append(
            {"n_docs": n, "wall_s": round(wall, 2), "n_dup_windows": ndup, "growth_exp": exp}
        )
        n *= 2
    print(json.dumps({"k": K, "steps": rows}))
    ray.shutdown()


if __name__ == "__main__":
    main()
