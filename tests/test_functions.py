"""Sketch/function accuracy tests (HLL — the HLLAgg analog)."""

import numpy as np

from apache___solr_ray.functions.hll import _M, hll_add, hll_estimate


def test_hll_accuracy_and_mergeability():
    rng = np.random.Generator(np.random.PCG64(7))
    vals = rng.integers(0, 1 << 62, 50_000, dtype=np.int64)
    exact = len(np.unique(vals))

    # single sketch
    regs = np.zeros(_M, dtype=np.uint8)
    hll_add(regs, vals)
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.05  # p=12 → ~1.6% typical error

    # merge of partials must equal the single sketch (register-wise max)
    r1 = np.zeros(_M, dtype=np.uint8)
    r2 = np.zeros(_M, dtype=np.uint8)
    hll_add(r1, vals[:25_000])
    hll_add(r2, vals[25_000:])
    merged = np.maximum(r1, r2)
    assert (merged == regs).all()


def test_hll_small_range_linear_counting():
    regs = np.zeros(_M, dtype=np.uint8)
    vals = np.arange(100, dtype=np.int64)
    hll_add(regs, vals)
    assert abs(hll_estimate(regs) - 100) < 5
