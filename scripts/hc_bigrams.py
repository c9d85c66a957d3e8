"""Bigram-vocab / component knob (round-4 evidence for the driver-side
materialization fixes): build a /tmp variant of an sf dir whose
documents.text carries KX extra UNIQUE junk tokens per row — the distinct
BIGRAM vocabulary grows by ~KX x n_rows (each junk token mints new
bigrams) — then time:

- shingle_bigram_top  (was to_pandas().head(20) over the full bigram
  vocab; now a distributed sort+limit — must stay ~flat),
- mlt_similar_docs    (was driver-side pandas top-10 over the overlap
  aggregate; now sort+limit),
- near_dup_components (labels now returned as a Dataset, never collected;
  the junk also perturbs the candidate/component structure).

Usage: python scripts/hc_bigrams.py [sf_dir] [KX]
"""
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KX = int(sys.argv[2]) if len(sys.argv) > 2 else 10
HC = f"/tmp/hcb_{os.path.basename(SF.rstrip('/'))}_k{KX}"


def make_hc():
    os.makedirs(HC, exist_ok=True)
    for f in os.listdir(SF):
        dst = os.path.join(HC, f)
        if f == "documents.parquet" or os.path.exists(dst):
            continue
        os.symlink(os.path.join(SF, f), dst)
    dst = os.path.join(HC, "documents.parquet")
    if os.path.exists(dst):
        return
    t = pq.read_table(os.path.join(SF, "documents.parquet"))
    n = t.num_rows
    junk = pa.array(
        [" ".join(f"bq{i * KX + j}" for j in range(KX)) for i in range(n)],
        pa.string(),
    )
    text = pc.binary_join_element_wise(t.column("text"), junk, " ")
    t = t.set_column(t.schema.get_field_index("text"), "text", text)
    pq.write_table(t, dst)
    print(f"{HC}: {n} rows, ~+{n * KX} distinct bigrams")


def timed(name, sf_dir):
    from apache___solr_ray.pipelines.text import QUERIES

    t0 = time.time()
    res = QUERIES[name](sf_dir)
    if hasattr(res, "to_pandas"):  # execute lazy Datasets / materialize tables
        res = res.to_pandas()
    return round(time.time() - t0, 2)


if __name__ == "__main__":
    import ray

    make_hc()
    ray.init(address="local", num_cpus=32, include_dashboard=False)
    for name in ("shingle_bigram_top", "mlt_similar_docs", "near_dup_components"):
        timed(name, SF)  # warmup, untimed
        base = timed(name, SF)
        hc = timed(name, HC)
        print(f"{name}: base={base}s  x{KX}bigrams={hc}s  ratio={hc / max(base, 1e-9):.2f}")
    ray.shutdown()
