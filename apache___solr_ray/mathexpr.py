"""Math-expression evaluators for the streaming DSL's ``let()``.

Reference surface: the solrj-streaming math-expressions layer —
``solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/eval/``
(249 evaluator classes, e.g. ``CorrelationEvaluator.java``,
``RegressionEvaluator.java``, ``MovingAverageEvaluator.java``,
``PercentileEvaluator.java``, ``DescribeEvaluator.java``,
``HistogramEvaluator.java``; user guide ``math-expressions.adoc``). This
module implements the statistical/array core of that surface (~35
evaluators) over numpy.

Memory model — same as the reference, stated plainly: Solr evaluates a
``let()`` on ONE worker over in-memory vectors (``col()`` reads a stream
into a list). Here ``col()`` collects one COLUMN of a compiled Ray
Dataset onto the driver under ``LET_VECTOR_MAX`` (metadata count checked
BEFORE collection); everything upstream of ``col()`` — the search,
filters, joins, rollups feeding it — still runs distributed. Vectors are
bounded model state (regression inputs, time series), not the corpus.

Result mapping back to the tuple stream:
- scalar            -> one row        {"result": x}
- vector            -> rows           {"i": 0.., "value": v[i]}
- dict (regress,
  describe)         -> one row, keys as columns
- list of dicts
  (hist)            -> one row per bin
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LET_VECTOR_MAX = 10_000_000


class MathExprError(ValueError):
    pass


def _round_half_up(x, nd: int):
    """floor(x * 10^nd + 0.5) / 10^nd — the repo's oracle rounding
    convention (DuckDB comparisons use the same expression), NOT numpy's
    banker's rounding."""
    k = 10.0**nd
    return np.floor(np.asarray(x, dtype=np.float64) * k + 0.5) / k


def _vec(x, name: str) -> np.ndarray:
    a = np.asarray(x, dtype=np.float64)
    if a.ndim != 1:
        raise MathExprError(f"{name} expects a 1-D vector")
    return a


def _pair(a, b, name: str):
    va, vb = _vec(a, name), _vec(b, name)
    if len(va) != len(vb):
        raise MathExprError(f"{name}: vector lengths differ ({len(va)} vs {len(vb)})")
    return va, vb


# -- evaluator implementations (numpy; sample statistics like the
# -- commons-math backed reference evaluators) --------------------------------


def _corr(a, b):
    va, vb = _pair(a, b, "corr")
    return float(np.corrcoef(va, vb)[0, 1])


def _cov(a, b):
    va, vb = _pair(a, b, "cov")
    return float(np.cov(va, vb, ddof=1)[0, 1])


def _regress(a, b):
    """RegressionEvaluator: ordinary least squares of b on a.
    Returns {slope, intercept, rsquared} (the reference tuple carries
    slope/intercept/RSquared from commons-math SimpleRegression)."""
    x, y = _pair(a, b, "regress")
    xm, ym = x.mean(), y.mean()
    sxx = ((x - xm) ** 2).sum()
    sxy = ((x - xm) * (y - ym)).sum()
    slope = sxy / sxx
    intercept = ym - slope * xm
    ss_res = ((y - (slope * x + intercept)) ** 2).sum()
    ss_tot = ((y - ym) ** 2).sum()
    return {
        "slope": float(slope),
        "intercept": float(intercept),
        "rsquared": float(1.0 - ss_res / ss_tot),
    }


def _predict(model, x):
    if not isinstance(model, dict) or "slope" not in model:
        raise MathExprError("predict() expects a regress() result")
    return model["slope"] * np.asarray(x, dtype=np.float64) + model["intercept"]


def _moving_avg(v, w):
    a = _vec(v, "movingAvg")
    w = int(w)
    if w < 1 or w > len(a):
        raise MathExprError("movingAvg window out of range")
    c = np.cumsum(np.concatenate([[0.0], a]))
    return (c[w:] - c[:-w]) / w


def _moving_median(v, w):
    a = _vec(v, "movingMedian")
    w = int(w)
    if w < 1 or w > len(a):
        raise MathExprError("movingMedian window out of range")
    from numpy.lib.stride_tricks import sliding_window_view

    return np.median(sliding_window_view(a, w), axis=1)


def _describe(v):
    a = _vec(v, "describe")
    return {
        "n": float(len(a)),
        "mean": float(a.mean()),
        "min": float(a.min()),
        "max": float(a.max()),
        "stddev": float(a.std(ddof=1)),
    }


def _hist(v, bins):
    a = _vec(v, "hist")
    counts, edges = np.histogram(a, bins=int(bins))
    return [
        {"bin": float(i), "lo": float(edges[i]), "hi": float(edges[i + 1]), "n": float(c)}
        for i, c in enumerate(counts)
    ]


def _ttest(a, b):
    """TTestEvaluator (Welch's unequal-variance two-sample t): returns
    {t, df} — the statistic and Welch–Satterthwaite degrees of freedom
    (the p-value needs a t-distribution CDF; the reference delegates to
    commons-math, out of stdlib scope and stated so)."""
    va, vb = _vec(a, "ttest"), _vec(b, "ttest")
    n1, n2 = len(va), len(vb)
    v1, v2 = va.var(ddof=1) / n1, vb.var(ddof=1) / n2
    t = (va.mean() - vb.mean()) / np.sqrt(v1 + v2)
    df = (v1 + v2) ** 2 / (v1**2 / (n1 - 1) + v2**2 / (n2 - 1))
    return {"t": float(t), "df": float(df)}


def _precision(x, nd):
    """PrecisionEvaluator: round number / vector / dict / bin list with the
    oracle's floor(x*10^nd + 0.5)/10^nd convention."""
    nd = int(nd)
    if isinstance(x, dict):
        return {k: float(_round_half_up(v, nd)) for k, v in x.items()}
    if isinstance(x, list):
        return [_precision(e, nd) for e in x]
    if np.ndim(x) == 0:
        return float(_round_half_up(x, nd))
    return _round_half_up(x, nd)


def _sequence(length, start, stride):
    return np.arange(int(length), dtype=np.float64) * float(stride) + float(start)


def _zscores(v):
    a = _vec(v, "zscores")
    return (a - a.mean()) / a.std(ddof=1)


def _unitize(v):
    a = _vec(v, "unitize")
    return a / np.linalg.norm(a)


def _ebe(op):
    def fn(a, b):
        va, vb = _pair(a, b, "ebe")
        return op(va, vb)

    return fn


EVALS: dict = {
    # arithmetic (scalar or elementwise on vectors)
    "add": lambda *xs: np.sum([np.asarray(x, np.float64) for x in xs], axis=0),
    "sub": lambda a, b: np.asarray(a, np.float64) - np.asarray(b, np.float64),
    "mult": lambda *xs: np.prod([np.asarray(x, np.float64) for x in xs], axis=0),
    "div": lambda a, b: np.asarray(a, np.float64) / np.asarray(b, np.float64),
    "pow": lambda a, b: np.asarray(a, np.float64) ** np.asarray(b, np.float64),
    "sqrt": lambda x: np.sqrt(np.asarray(x, np.float64)),
    "abs": lambda x: np.abs(np.asarray(x, np.float64)),
    "log": lambda x: np.log(np.asarray(x, np.float64)),
    "log10": lambda x: np.log10(np.asarray(x, np.float64)),
    "exp": lambda x: np.exp(np.asarray(x, np.float64)),
    "ceil": lambda x: np.ceil(np.asarray(x, np.float64)),
    "floor": lambda x: np.floor(np.asarray(x, np.float64)),
    "round": lambda x, nd=0: _round_half_up(x, int(nd)),
    "scale": lambda c, v: float(c) * _vec(v, "scale"),
    # element-by-element vector ops
    "ebeAdd": _ebe(np.add),
    "ebeSubtract": _ebe(np.subtract),
    "ebeMultiply": _ebe(np.multiply),
    "ebeDivide": _ebe(np.divide),
    "dotProduct": lambda a, b: float(np.dot(*_pair(a, b, "dotProduct"))),
    "cosineSimilarity": lambda a, b: float(
        np.dot(*_pair(a, b, "cosineSimilarity"))
        / (np.linalg.norm(np.asarray(a, np.float64)) * np.linalg.norm(np.asarray(b, np.float64)))
    ),
    "euclideanDistance": lambda a, b: float(
        np.linalg.norm(np.subtract(*_pair(a, b, "euclideanDistance")))
    ),
    # reductions / statistics (sample stats, commons-math semantics)
    "mean": lambda v: float(_vec(v, "mean").mean()),
    "sumf": lambda v: float(_vec(v, "sumf").sum()),
    "minf": lambda v: float(_vec(v, "minf").min()),
    "maxf": lambda v: float(_vec(v, "maxf").max()),
    "variance": lambda v: float(_vec(v, "variance").var(ddof=1)),
    "stddev": lambda v: float(_vec(v, "stddev").std(ddof=1)),
    "percentile": lambda v, p: float(np.percentile(_vec(v, "percentile"), float(p))),
    "corr": _corr,
    "cov": _cov,
    "regress": _regress,
    "predict": _predict,
    "describe": _describe,
    "ttest": _ttest,
    "hist": _hist,
    "precision": _precision,
    # series / array utilities
    "movingAvg": _moving_avg,
    "movingMedian": _moving_median,
    "diff": lambda v, lag=1: _vec(v, "diff")[int(lag):] - _vec(v, "diff")[: -int(lag)],
    "cumulativeSum": lambda v: np.cumsum(_vec(v, "cumulativeSum")),
    "length": lambda v: float(len(_vec(v, "length"))),
    "rev": lambda v: _vec(v, "rev")[::-1],
    "array": lambda *xs: np.asarray([float(x) for x in xs]),
    "sequence": _sequence,
    "zscores": _zscores,
    "unitize": _unitize,
}


def eval_node(node, env: dict, col_fn):
    """Evaluate a parsed expression Node against ``env``. ``col_fn`` is the
    streamexpr callback resolving ``col(stream, field)`` to a numpy vector
    (it owns compilation, the declared-sort application and the
    LET_VECTOR_MAX guard)."""
    # late import keeps this module parser-agnostic (Node is duck-typed)
    if node.name == "col":
        return col_fn(node)
    fn = EVALS.get(node.name)
    if fn is None:
        raise MathExprError(f"unknown evaluator {node.name!r}")
    args = []
    for a in node.args:
        if isinstance(a, str):
            if a in env:
                args.append(env[a])
            else:
                try:
                    args.append(float(a) if "." in a else int(a))
                except ValueError:
                    raise MathExprError(f"unbound variable {a!r}") from None
        else:
            args.append(eval_node(a, env, col_fn))
    return fn(*args)


def result_to_table(res) -> pa.Table:
    """Map an evaluator result back into a tuple stream (see module doc)."""
    if isinstance(res, dict):
        return pa.table({k: pa.array([float(v)]) for k, v in res.items()})
    if isinstance(res, list):  # hist bins
        if not res:
            return pa.table({"bin": pa.array([], pa.float64())})
        keys = list(res[0].keys())
        return pa.table({k: pa.array([float(r[k]) for r in res]) for k in keys})
    a = np.asarray(res)
    if a.ndim == 0:
        return pa.table({"result": pa.array([float(a)])})
    if a.ndim == 1:
        return pa.table(
            {
                "i": pa.array(np.arange(len(a), dtype=np.int64)),
                "value": pa.array(a.astype(np.float64)),
            }
        )
    raise MathExprError(f"cannot emit result of shape {a.shape}")
