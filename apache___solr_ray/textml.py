"""Text-ML streams — feature selection + logistic-regression training over
a text column, Ray-Data-first.

Reference surface: ``solr/solrj-streaming/src/java/org/apache/solr/client/
solrj/io/stream/FeaturesSelectionStream.java`` (per-shard term/class count
partials -> coordinator merges -> information-gain scores, top numTerms)
and ``TextLogitStream.java`` (iterative training: each shard computes the
gradient of the logistic loss over its documents against the broadcast
weight vector; the coordinator sums the partials and updates the weights;
repeat for maxIterations).

The Ray shapes:

- ``features_selection``: ONE pass of per-batch (term, positive-df,
  negative-df) partials inside ``map_batches`` + one ``groupby(term)``
  merge (exactly the per-shard partial/merge split of the reference), a
  metadata-sized class-count aggregate, then a vectorized IG computation
  over the merged term table. No driver materialization of the corpus.
- ``text_logit``: the doc->feature-vector encoding runs ONCE and is
  materialized to object-store blocks; every iteration is a
  ``map_batches`` over those cached blocks emitting a fixed-size partial
  (gradient vector, example count, loss, error count) — the only
  driver-side state is the (num_terms+1)-float weight vector, broadcast
  back into the next iteration's closure. This is the reference's
  shard-gradient loop with the object store standing in for the /export
  re-read.

Scale notes: partial tables are bounded by vocabulary x batches; the
gradient partial is O(num_terms) per BATCH (not per doc); iterations
re-read cached Arrow blocks, not parquet.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from apache___solr_ray.analyze import simple_tokenize


def _label_mask(t: pa.Table, outcome: str, positive) -> np.ndarray:
    col = t.column(outcome)
    val = positive
    if pa.types.is_integer(col.type):
        val = int(positive)
    elif pa.types.is_floating(col.type):
        val = float(positive)
    return pc.equal(col, pa.scalar(val)).to_numpy(zero_copy_only=False)


def features_selection(
    ds, field: str, outcome: str, positive, num_terms: int
) -> pa.Table:
    """Top ``num_terms`` terms of ``field`` by information gain against the
    binary outcome ``outcome == positive``. Returns an Arrow table
    (term, score, idx) sorted by score desc, term asc.

    IG(t) = H(C) - p(t) H(C|t) - (1-p(t)) H(C|not t) over document
    presence counts (FeaturesSelectionStream.java scores with the same
    term/class docFreq partials)."""
    from ray.data.aggregate import Sum

    _COUNTS = "\x00counts"  # sentinel row carrying the batch class counts

    def partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        pos_mask = _label_mask(t, outcome, positive)
        dfp: Counter = Counter()
        dfn: Counter = Counter()
        for i, txt in enumerate(t.column(field).to_pylist()):
            toks = set(simple_tokenize(txt or ""))
            (dfp if pos_mask[i] else dfn).update(toks)
        terms = sorted(set(dfp) | set(dfn)) + [_COUNTS]
        k = len(terms)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "dfp_p": pa.array([dfp.get(w, 0) for w in terms], pa.int64()),
                "dfn_p": pa.array([dfn.get(w, 0) for w in terms], pa.int64()),
                "np_p": pa.array([0] * (k - 1) + [int(pos_mask.sum())], pa.int64()),
                "nn_p": pa.array([0] * (k - 1) + [int((~pos_mask).sum())], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Sum("dfp_p", alias_name="dfp"),
            Sum("dfn_p", alias_name="dfn"),
            Sum("np_p", alias_name="np_part"),
            Sum("nn_p", alias_name="nn_part"),
        )
    ).materialize()

    # class totals: a metadata-sized sum over the merged table (only the
    # sentinel row carries non-zero values)
    tot = merged.sum(["np_part", "nn_part"])
    n_pos = int(tot["sum(np_part)"] or 0)
    n_neg = int(tot["sum(nn_part)"] or 0)
    n = n_pos + n_neg
    empty = pa.table(
        {
            "term": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "idx": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty

    def h(p: np.ndarray) -> np.ndarray:
        """Binary entropy with 0*log0 = 0."""
        p = np.clip(p, 0.0, 1.0)
        out = np.zeros_like(p)
        m = (p > 0) & (p < 1)
        out[m] = -(p[m] * np.log2(p[m]) + (1 - p[m]) * np.log2(1 - p[m]))
        return out

    h_c = float(h(np.array([n_pos / n])))

    def ig_block(t: pa.Table) -> pa.Table:
        # vocabulary stays distributed: each block scores its terms
        t = t.filter(pc.not_equal(t.column("term"), pa.scalar(_COUNTS)))
        a = t.column("dfp").to_numpy(zero_copy_only=False).astype(np.float64)
        b = t.column("dfn").to_numpy(zero_copy_only=False).astype(np.float64)
        df = a + b
        with np.errstate(divide="ignore", invalid="ignore"):
            h_ct = h(np.where(df > 0, a / np.maximum(df, 1), 0.0))
            rest = n - df
            h_cnt = h(np.where(rest > 0, (n_pos - a) / np.maximum(rest, 1), 0.0))
        ig = h_c - (df / n) * h_ct - (rest / n) * h_cnt
        return pa.table(
            {
                "term": t.column("term"),
                "score": pa.array(np.round(ig, 10), pa.float64()),
            }
        )

    top = (
        merged.map_batches(ig_block, batch_format="pyarrow")
        .sort(["score", "term"], descending=[True, False])
        .limit(num_terms)
        .take_all()
    )
    if not top:
        return empty
    return pa.table(
        {
            "term": pa.array([r["term"] for r in top], pa.string()),
            "score": pa.array([float(r["score"]) for r in top], pa.float64()),
            "idx": pa.array(list(range(len(top))), pa.int64()),
        }
    )


def text_logit(
    ds,
    field: str,
    outcome: str,
    positive,
    terms: list[str],
    max_iterations: int = 25,
    learning_rate: float = 1.0,
):
    """Train a logistic-regression model over binary term-presence features
    (TextLogitStream.java's shard-gradient loop). Returns
    (weights ndarray [bias first], final train error rate, iterations run).

    The feature encoding runs once (map_batches -> materialized Arrow
    blocks: a doc x num_terms 0/1 matrix packed as a FixedSizeList column);
    every iteration streams those blocks computing one O(num_terms)
    gradient partial per batch against the broadcast weights."""
    import ray

    tindex = {w: i for i, w in enumerate(terms)}
    d = len(terms)

    def encode(t: pa.Table) -> pa.Table:
        pos_mask = _label_mask(t, outcome, positive)
        X = np.zeros((t.num_rows, d), dtype=np.float32)
        for i, txt in enumerate(t.column(field).to_pylist()):
            for w in set(simple_tokenize(txt or "")):
                j = tindex.get(w)
                if j is not None:
                    X[i, j] = 1.0
        return pa.table(
            {
                "x": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.ravel(), pa.float32()), d
                ),
                "y": pa.array(pos_mask.astype(np.float64)),
            }
        )

    feats = ds.map_batches(encode, batch_format="pyarrow").materialize()

    w = np.zeros(d + 1, dtype=np.float64)  # [bias, w_1..w_d]
    lr = learning_rate
    best = (np.inf, 1.0, w)  # (mean loss, error rate, weights)
    prev_loss = np.inf
    prev_w = w
    it = 0
    for it in range(1, max_iterations + 1):
        wref = ray.put(w)

        def grad_partial(t: pa.Table, _wref=wref) -> pa.Table:
            wv = ray.get(_wref)
            X = np.asarray(t.column("x").combine_chunks().flatten()).reshape(
                t.num_rows, d
            ).astype(np.float64)
            y = t.column("y").to_numpy(zero_copy_only=False)
            z = X @ wv[1:] + wv[0]
            p = 1.0 / (1.0 + np.exp(-z))
            resid = p - y
            g = np.empty(d + 1)
            g[0] = resid.sum()
            g[1:] = X.T @ resid
            wrong = int(((p >= 0.5) != (y >= 0.5)).sum())
            # numerically-stable logistic loss: log(1+e^-|z|) + max(0, -yz')
            zs = np.where(y >= 0.5, z, -z)
            loss = float(np.sum(np.log1p(np.exp(-np.abs(zs))) + np.maximum(-zs, 0)))
            return pa.table(
                {
                    "g": pa.FixedSizeListArray.from_arrays(
                        pa.array(g, pa.float64()), d + 1
                    ),
                    "n": pa.array([t.num_rows], pa.int64()),
                    "wrong": pa.array([wrong], pa.int64()),
                    "loss": pa.array([loss], pa.float64()),
                }
            )

        parts = feats.map_batches(grad_partial, batch_format="pyarrow").take_all()
        n = sum(r["n"] for r in parts)
        grad = np.sum([np.asarray(r["g"]) for r in parts], axis=0) / max(n, 1)
        err = sum(r["wrong"] for r in parts) / max(n, 1)
        loss = sum(r["loss"] for r in parts) / max(n, 1)
        if loss > prev_loss + 1e-12:
            # overshoot (lr above the smooth-loss ceiling): undo the step,
            # halve the rate and retry from the previous iterate —
            # TextLogitStream's fixed-rate loop relies on a tuned rate;
            # this keeps the distributed loop self-tuning
            w = prev_w
            lr *= 0.5
            continue
        if loss < best[0]:
            best = (loss, err, w)
        prev_loss, prev_w = loss, w
        w = w - lr * grad
    return best[2], best[1], it
