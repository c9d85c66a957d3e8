"""HyperLogLog sketch — the HLLAgg analog (reference
``solr/core/src/java/org/apache/solr/search/facet/HLLAgg.java``; Solr wraps
java-hll with log2m=13; we use the standard Flajolet–Fung–Gandouet–Meunier
estimator with p=12, published algorithm).

Mergeable by register-wise max, so it composes with Ray Data's
partial+final aggregation: ``hll_partial_batch`` is the per-batch combiner
(``map_batches``), the driver or a tiny groupby does the max-merge. The
shuffle moves 4 KiB registers per (group, batch) instead of raw values —
the point of a sketch at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 12
_M = 1 << HLL_P
_HASH_KEY = "abcdef0123456789"


def _hash64(vals: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(vals, hash_key=_HASH_KEY, categorize=False)


def hll_add(registers: np.ndarray, values: np.ndarray) -> None:
    """Fold raw values into uint8 registers[_M] in place (vectorized)."""
    h = _hash64(values)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = leading zeros of the remaining bits + 1, via bit length
    lz = np.zeros(len(rest), dtype=np.uint8)
    v = rest
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        v = np.where(mask, v << np.uint64(shift), v)
    rank = lz + 1
    np.maximum.at(registers, idx, rank)


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimate with small/large-range corrections."""
    m = float(_M)
    inv = np.ldexp(1.0, -registers.astype(np.int64))
    e = (0.7213 / (1 + 1.079 / m)) * m * m / inv.sum()
    zeros = int((registers == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting
    if e > (1 << 32) / 30.0:
        return -(2.0**32) * np.log(1 - e / 2.0**32)
    return float(e)


def hll_partial_batch(group_col: str, value_col: str):
    """map_batches combiner: one (group, registers) row per group per batch."""

    def run(t: pa.Table) -> pa.Table:
        groups = t.column(group_col).to_pylist()
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        sketches: dict = {}
        order = np.argsort(np.asarray(groups, dtype=object), kind="stable")
        garr = np.asarray(groups, dtype=object)[order]
        varr = vals[order]
        bounds = np.flatnonzero(garr[1:] != garr[:-1]) + 1
        starts = np.concatenate([[0], bounds]).astype(np.int64)
        ends = np.concatenate([bounds, [len(garr)]]).astype(np.int64)
        for s, e in zip(starts, ends):
            if e <= s:
                continue
            regs = sketches.setdefault(garr[s], np.zeros(_M, dtype=np.uint8))
            hll_add(regs, varr[s:e])
        keys = sorted(sketches)
        return pa.table(
            {
                group_col: pa.array([str(k) for k in keys], pa.string()),
                "registers": pa.array([sketches[k].tobytes() for k in keys], pa.binary()),
            }
        )

    return run
