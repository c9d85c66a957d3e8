"""Vocabulary knob (FIXTURES.md): build a /tmp variant of an sf dir whose
documents.text carries KX extra UNIQUE junk tokens per row (vocab grows by
KX x n_rows distinct terms), then time spell_suggest on both. The
distributed spell path (vectorized prefilter over a vocab that stays a
Dataset) must grow ~sub-linearly; the old driver-side per-term Python loop
was O(vocab) interpreter time.

Usage: python scripts/hc_vocab.py [sf_dir] [KX]
"""
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KX = int(sys.argv[2]) if len(sys.argv) > 2 else 2
HC = f"/tmp/hcv_{os.path.basename(SF.rstrip('/'))}_k{KX}"


def make_hc():
    os.makedirs(HC, exist_ok=True)
    for f in os.listdir(SF):
        dst = os.path.join(HC, f)
        if f == "documents.parquet" or os.path.exists(dst):
            continue
        os.symlink(os.path.join(SF, f), dst)
    t = pq.read_table(os.path.join(SF, "documents.parquet"))
    n = t.num_rows
    junk = pa.array(
        [" ".join(f"jq{i * KX + j}" for j in range(KX)) for i in range(n)],
        pa.string(),
    )
    text = pc.binary_join_element_wise(t.column("text"), junk, " ")
    t = t.set_column(t.schema.get_field_index("text"), "text", text)
    pq.write_table(t, os.path.join(HC, "documents.parquet"))
    print(f"{HC}: {n} rows, +{n * KX} junk vocab terms")


def time_spell(sf_dir):
    from apache___solr_ray.pipelines.text import QUERIES

    t0 = time.time()
    QUERIES["spell_suggest"](sf_dir).to_pandas()
    return round(time.time() - t0, 2)


if __name__ == "__main__":
    import ray

    make_hc()
    ray.init(address="local", num_cpus=32, include_dashboard=False)
    time_spell(SF)  # session warmup, untimed
    print("base :", time_spell(SF))
    print(f"x{KX}vocab:", time_spell(HC))
    ray.shutdown()
