"""Events user-cardinality knob (FIXTURES.md): build a /tmp variant of an
sf dir whose events.parquet has KX x the distinct user_ids (same row count),
then time the windowed/per-group family on both. The vectorized per-batch
group kernels must stay ~flat as cardinality rises 10x (the old per-group
map_groups dispatch was O(groups) Python calls).

Usage: python scripts/hc_events.py [sf_dir] [KX]
"""
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KX = int(sys.argv[2]) if len(sys.argv) > 2 else 10
HC = f"/tmp/hc_{os.path.basename(SF.rstrip('/'))}_x{KX}"

ENTRIES = [
    "collapse_latest_event",
    "sessionize_events",
    "expand_top_event",
    "percentile_per_type",
    "window_rank_orders",
]


def make_hc():
    os.makedirs(HC, exist_ok=True)
    for f in os.listdir(SF):
        dst = os.path.join(HC, f)
        if f == "events.parquet" or os.path.exists(dst):
            continue
        os.symlink(os.path.join(SF, f), dst)
    t = pq.read_table(os.path.join(SF, "events.parquet"))
    u = t.column("user_id").to_numpy()
    salt = (np.arange(len(u)) % KX).astype(u.dtype)
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pa.array(u * KX + salt))
    pq.write_table(t, os.path.join(HC, "events.parquet"))
    print(f"{HC}: {len(u)} rows, {len(np.unique(u))} -> {len(np.unique(u*KX+salt))} users")


def run(sf_dir):
    import __ray_entry__ as E
    qs = E.queries()
    out = {}
    for name in ENTRIES:
        t0 = time.time()
        r = qs[name](sf_dir)
        if hasattr(r, "to_pandas"):
            r.to_pandas()
        out[name] = round(time.time() - t0, 2)
    return out


if __name__ == "__main__":
    import ray
    make_hc()
    ray.init(address="local", num_cpus=32, include_dashboard=False)
    base = run(SF)
    hc = run(HC)
    print("base:", base)
    print(f"x{KX} :", hc)
    ray.shutdown()
