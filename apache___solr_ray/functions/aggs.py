"""Mergeable sketch aggregates as Ray Data ``AggregateFnV2`` subclasses.

This is the reference's partial+final facet-aggregation shape
(``solr/core/src/java/org/apache/solr/search/facet/HLLAgg.java``,
``PercentileAgg.java``: each shard folds its docs into a sketch, the
coordinator merges sketches) expressed in Ray Data's native aggregation
protocol: ``aggregate_block`` is the per-block partial, ``combine`` runs
inside the shuffle (never on the driver), ``finalize`` produces the value.
At 10^12 rows the exchange moves kilobyte sketches per (group, block)
instead of raw values.

Accumulators are ``bytes`` (HLL registers / serialized t-digest) so they
ride any block format without custom serialization.
"""

from __future__ import annotations

import numpy as np
from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from apache___solr_ray.functions.hll import _M, hll_add, hll_estimate
from apache___solr_ray.functions.tdigest import TDigest


class HLLSketch(AggregateFnV2):
    """Approximate distinct count (HLLAgg analog), mergeable in-shuffle."""

    def __init__(self, on: str, alias_name: str | None = None):
        super().__init__(
            alias_name or f"hll({on})",
            zero_factory=lambda: b"",
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block: Block):
        col = BlockAccessor.for_block(block).to_arrow().column(self._target_col_name)
        vals = col.drop_null().to_numpy(zero_copy_only=False)
        if len(vals) == 0:
            return b""
        regs = np.zeros(_M, dtype=np.uint8)
        hll_add(regs, vals)
        return regs.tobytes()

    def combine(self, a, b):
        if not a:
            return b
        if not b:
            return a
        return np.maximum(
            np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    def finalize(self, acc):
        if not acc:
            return 0
        return int(round(hll_estimate(np.frombuffer(acc, dtype=np.uint8))))


class TDigestSketch(AggregateFnV2):
    """Mergeable quantile sketch (PercentileAgg analog). ``q=None`` yields
    the serialized digest (caller finalizes several quantiles from one
    sketch); a float ``q`` yields that quantile directly."""

    def __init__(self, on: str, q: float | None = None, alias_name: str | None = None):
        self._q = q
        super().__init__(
            alias_name or (f"tdigest({on})" if q is None else f"p{int(q * 100)}({on})"),
            zero_factory=lambda: b"",
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block: Block):
        col = BlockAccessor.for_block(block).to_arrow().column(self._target_col_name)
        vals = col.drop_null().to_numpy(zero_copy_only=False)
        if len(vals) == 0:
            return b""
        return TDigest().add(vals.astype(np.float64)).to_bytes()

    def combine(self, a, b):
        if not a:
            return b
        if not b:
            return a
        return TDigest.from_bytes(a).merge(TDigest.from_bytes(b)).to_bytes()

    def finalize(self, acc):
        if not acc:
            return None if self._q is not None else b""
        if self._q is None:
            return acc
        return float(TDigest.from_bytes(acc).quantile(self._q))
