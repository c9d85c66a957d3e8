"""Math-expression evaluators for the streaming DSL's ``let()``.

Reference surface: the solrj-streaming math-expressions layer —
``solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/eval/``
(249 evaluator classes, e.g. ``CorrelationEvaluator.java``,
``RegressionEvaluator.java``, ``MovingAverageEvaluator.java``,
``PercentileEvaluator.java``, ``DescribeEvaluator.java``,
``HistogramEvaluator.java``; user guide ``math-expressions.adoc``). This
module implements the statistical/array/matrix/signal/distribution core
of that surface (~150 evaluators) over numpy + stdlib math. p-values the
reference gets from commons-math distributions are computed here with the
classic regularized incomplete beta/gamma continued-fraction and series
forms (Abramowitz & Stegun 6.5/26.5; public-domain algorithms).

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
  (hist, freqTable) -> one row per bin
- matrix (2-D)      -> long rows      {"i", "j", "value"}
- model dicts (lerp/spline/ols/knn/kmeans/distributions) are
  INTERMEDIATE values — feed them to predict()/sample()/getValue();
  emitting one directly raises with that hint.
"""

from __future__ import annotations

import math

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
        return {
            k: (v if isinstance(v, str) else _precision(v, nd)) for k, v in x.items()
        }
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
    if node.name == "tuple":
        # TupStream inside let(): one row whose fields are evaluator results
        out = {}
        for k, v in node.params.items():
            if hasattr(v, "name"):  # a Node
                out[k] = eval_node(v, env, col_fn)
            elif isinstance(v, str) and v in env:
                out[k] = env[v]
            else:
                out[k] = float(v)
        return out
    if node.name == "monteCarlo":
        # MonteCarloEvaluator (io/eval/MonteCarloEvaluator.java): LAZY — the
        # first operand is re-evaluated `n` times and the results collected;
        # distributions inside re-sample each iteration. Deterministic here:
        # the iteration index offsets the sampling seed.
        if len(node.args) != 2:
            raise MathExprError("monteCarlo(expr, iterations) expects two operands")

        def _ev(a):
            if hasattr(a, "name"):
                return eval_node(a, env, col_fn)
            if isinstance(a, str):
                return env[a] if a in env else float(a)
            return a

        n_it = int(_ev(node.args[1]))
        if not 1 <= n_it <= 1_000_000:
            raise MathExprError("monteCarlo: iterations out of range")
        global _MC_OFFSET
        out = np.empty(n_it, dtype=np.float64)
        try:
            for i in range(n_it):
                _MC_OFFSET = i + 1
                out[i] = float(_ev(node.args[0]))
        finally:
            _MC_OFFSET = 0
        return out
    if node.name in ("latlonVectors", "termVectors"):
        # named-parameter evaluators (field=/minTermLength=/minDocFreq=/
        # maxDocFreq=/exclude=) — the generic path below is positional-only
        if len(node.args) != 1:
            raise MathExprError(f"{node.name} takes one tuple-list operand")
        a = node.args[0]
        if isinstance(a, str):
            if a not in env:
                raise MathExprError(f"unbound variable {a!r}")
            tl = env[a]
        else:
            tl = eval_node(a, env, col_fn)
        p = node.params
        if node.name == "latlonVectors":
            if "field" not in p:
                raise MathExprError('latlonVectors requires field=')
            return EVALS["latlonVectors"](tl, str(p["field"]))
        excludes = tuple(s for s in str(p.get("exclude", "")).split(",") if s)
        return EVALS["termVectors"](
            tl,
            p.get("minTermLength", 3),
            p.get("minDocFreq", 0.05),
            p.get("maxDocFreq", 0.5),
            excludes,
        )
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
                    # the parser strips quotes, so a key argument like
                    # getValue(m, "f") arrives as a bare string; only the
                    # whitelisted key-taking evaluators may consume one —
                    # everywhere else an unresolved word is a typo'd variable
                    if node.name in _LITERAL_STR_FNS:
                        args.append(a)
                    else:
                        raise MathExprError(f"unbound variable {a!r}") from None
        else:
            args.append(eval_node(a, env, col_fn))
    return fn(*args)


def result_to_table(res) -> pa.Table:
    """Map an evaluator result back into a tuple stream (see module doc)."""
    if isinstance(res, dict):
        if any(isinstance(v, str) or np.ndim(v) > 0 for v in res.values()):
            raise MathExprError(
                "model/distribution results are intermediate values — extract "
                'a field with getValue(model, "key") or apply predict()/sample()'
            )
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
    if a.ndim == 2:
        n, m = a.shape
        return pa.table(
            {
                "i": pa.array(np.repeat(np.arange(n, dtype=np.int64), m)),
                "j": pa.array(np.tile(np.arange(m, dtype=np.int64), n)),
                "value": pa.array(a.astype(np.float64).ravel()),
            }
        )
    raise MathExprError(f"cannot emit result of shape {a.shape}")


# ---------------------------------------------------------------------------
# Special functions — regularized incomplete beta / gamma via the classic
# Lentz continued fraction and power series (Abramowitz & Stegun 6.5 / 26.5,
# same functions commons-math's distribution CDFs bottom out in). These back
# every p-value below (t, F, chi-square, normal, Kolmogorov).
# ---------------------------------------------------------------------------

_SF_EPS = 3e-15
_SF_FPMIN = 1e-300


def _betacf(a: float, b: float, x: float) -> float:
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _SF_FPMIN:
        d = _SF_FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _SF_FPMIN:
            d = _SF_FPMIN
        c = 1.0 + aa / c
        if abs(c) < _SF_FPMIN:
            c = _SF_FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _SF_FPMIN:
            d = _SF_FPMIN
        c = 1.0 + aa / c
        if abs(c) < _SF_FPMIN:
            c = _SF_FPMIN
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _SF_EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    front = math.exp(
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def gammainc_p(s: float, x: float) -> float:
    """Regularized lower incomplete gamma P(s, x)."""
    if x < 0 or s <= 0:
        raise MathExprError("gammainc_p domain")
    if x == 0.0:
        return 0.0
    if x < s + 1.0:  # series
        ap, total, delt = s, 1.0 / s, 1.0 / s
        for _ in range(500):
            ap += 1.0
            delt *= x / ap
            total += delt
            if abs(delt) < abs(total) * _SF_EPS:
                break
        return total * math.exp(-x + s * math.log(x) - math.lgamma(s))
    # continued fraction for Q(s, x)
    b = x + 1.0 - s
    c = 1.0 / _SF_FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < _SF_FPMIN:
            d = _SF_FPMIN
        c = b + an / c
        if abs(c) < _SF_FPMIN:
            c = _SF_FPMIN
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _SF_EPS:
            break
    q = math.exp(-x + s * math.log(x) - math.lgamma(s)) * h
    return 1.0 - q


def norm_cdf(x: float, mean: float = 0.0, sd: float = 1.0) -> float:
    return 0.5 * (1.0 + math.erf((x - mean) / (sd * math.sqrt(2.0))))


def t_cdf(t: float, df: float) -> float:
    x = df / (df + t * t)
    p = 0.5 * betainc(df / 2.0, 0.5, x)
    return 1.0 - p if t > 0 else p


def f_cdf(f: float, d1: float, d2: float) -> float:
    if f <= 0:
        return 0.0
    return betainc(d1 / 2.0, d2 / 2.0, d1 * f / (d1 * f + d2))


def chi2_cdf(x: float, k: float) -> float:
    if x <= 0:
        return 0.0
    return gammainc_p(k / 2.0, x / 2.0)


def _kolmogorov_q(lam: float) -> float:
    """Q_KS(lambda) = 2 * sum_{j>=1} (-1)^{j-1} exp(-2 j^2 lambda^2)."""
    if lam <= 0:
        return 1.0
    total = 0.0
    for j in range(1, 101):
        term = 2.0 * (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-12:
            break
    return min(max(total, 0.0), 1.0)


# ---------------------------------------------------------------------------
# Statistics II — test statistics with p-values (AnovaEvaluator,
# MannWhitneyUEvaluator, KolmogorovSmirnovEvaluator, PairedTTestEvaluator,
# ChiSquareDataSetEvaluator in io/eval/); fractional ranks (RankEvaluator),
# frequency table (FrequencyTableEvaluator), mode/means.
# ---------------------------------------------------------------------------


def _geometric_mean(v):
    a = _vec(v, "geometricMean")
    if (a <= 0).any():
        raise MathExprError("geometricMean needs positive values")
    return float(np.exp(np.log(a).mean()))


def _harmonic_mean(v):
    a = _vec(v, "harmonicMean")
    return float(len(a) / (1.0 / a).sum())


def _mode(v):
    a = _vec(v, "mode")
    vals, counts = np.unique(a, return_counts=True)
    return float(vals[counts == counts.max()].min())


def _freq_table(v):
    a = _vec(v, "freqTable")
    vals, counts = np.unique(a, return_counts=True)
    n = float(len(a))
    return [
        {"value": float(val), "count": float(c), "pct": float(c / n)}
        for val, c in zip(vals, counts)
    ]


def _rank(v):
    """Fractional (mid) ranks, 1-based, ties averaged — commons-math
    NaturalRanking(TiesStrategy.AVERAGE), the RankEvaluator default."""
    a = _vec(v, "rank")
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a), dtype=np.float64)
    sorted_a = a[order]
    i = 0
    while i < len(a):
        j = i
        while j + 1 < len(a) and sorted_a[j + 1] == sorted_a[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def _anova(*vs):
    """One-way ANOVA over 2+ vectors: {f, p}."""
    groups = [_vec(v, "anova") for v in vs]
    if len(groups) < 2:
        raise MathExprError("anova needs >= 2 vectors")
    allv = np.concatenate(groups)
    gm = allv.mean()
    k, n = len(groups), len(allv)
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return {"f": float(f), "p": float(1.0 - f_cdf(f, k - 1, n - k))}


def _mann_whitney(a, b):
    """Mann-Whitney U with tie-corrected normal approximation:
    {u, u1, z, p}. u1 = R1 - n1(n1+1)/2 (rank-sum form over sample a),
    u = min(u1, n1*n2 - u1), p two-sided."""
    va, vb = _vec(a, "mannWhitney"), _vec(b, "mannWhitney")
    n1, n2 = len(va), len(vb)
    ranks = _rank(np.concatenate([va, vb]))
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    u = min(u1, n1 * n2 - u1)
    n = n1 + n2
    _, counts = np.unique(np.concatenate([va, vb]), return_counts=True)
    tie_term = float((counts.astype(np.float64) ** 3 - counts).sum())
    sigma2 = n1 * n2 / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
    if sigma2 <= 0:
        raise MathExprError("mannWhitney: zero variance (all values tied)")
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(sigma2)
    p = 2.0 * (1.0 - norm_cdf(abs(z)))
    return {"u": float(u), "u1": float(u1), "z": float(z), "p": float(p)}


def _ks(a, b):
    """Two-sample Kolmogorov-Smirnov: {d, p} (asymptotic p with the
    Stephens small-sample correction factor)."""
    va = np.sort(_vec(a, "ks"))
    vb = np.sort(_vec(b, "ks"))
    n1, n2 = len(va), len(vb)
    allv = np.concatenate([va, vb])
    cdf1 = np.searchsorted(va, allv, side="right") / n1
    cdf2 = np.searchsorted(vb, allv, side="right") / n2
    d = float(np.abs(cdf1 - cdf2).max())
    en = math.sqrt(n1 * n2 / (n1 + n2))
    p = _kolmogorov_q((en + 0.12 + 0.11 / en) * d)
    return {"d": d, "p": float(p)}


def _paired_ttest(a, b):
    va, vb = _pair(a, b, "pairedTtest")
    diff = va - vb
    n = len(diff)
    t = diff.mean() / (diff.std(ddof=1) / math.sqrt(n))
    df = n - 1
    p = 2.0 * (1.0 - t_cdf(abs(float(t)), df))
    return {"t": float(t), "df": float(df), "p": float(p)}


def _chisq_dataset(a, b):
    """Commons-math chiSquareDataSetsComparison: two observed count
    vectors, K-normalized: {chisq, df, p}."""
    va, vb = _pair(a, b, "chiSquareDataSet")
    if (va < 0).any() or (vb < 0).any() or (va + vb <= 0).any():
        raise MathExprError("chiSquareDataSet needs non-negative counts, no all-zero bin")
    k = math.sqrt(vb.sum() / va.sum())
    chisq = float((((k * va - vb / k) ** 2) / (va + vb)).sum())
    df = len(va) - 1
    return {"chisq": chisq, "df": float(df), "p": float(1.0 - chi2_cdf(chisq, df))}


# ---------------------------------------------------------------------------
# Vector utilities (CopyOf/CopyOfRange/ValueAt/Zeros/Ones/Natural/Primes/
# Asc/PairSort in io/eval/), norms & scaling (L1Norm/Norm/LInfNorm/
# NormalizeSum/MinMaxScale), distances (Manhattan/Canberra/Chebyshev/
# EarthMovers/Distance).
# ---------------------------------------------------------------------------


def _copy_of(v, n=None):
    a = _vec(v, "copyOf")
    n = len(a) if n is None else int(n)
    out = np.zeros(n, dtype=np.float64)  # Arrays.copyOf zero-pads
    out[: min(n, len(a))] = a[: min(n, len(a))]
    return out


def _copy_of_range(v, lo, hi):
    a = _vec(v, "copyOfRange")
    lo, hi = int(lo), int(hi)
    if not (0 <= lo <= hi <= len(a)):
        raise MathExprError("copyOfRange bounds out of range")
    return a[lo:hi].copy()


def _value_at(x, i, j=None):
    a = np.asarray(x, dtype=np.float64)
    if a.ndim == 1:
        return float(a[int(i)])
    if a.ndim == 2:
        if j is None:
            raise MathExprError("valueAt(matrix, i, j) needs two indices")
        return float(a[int(i), int(j)])
    raise MathExprError("valueAt expects a vector or matrix")


def _primes(n, start=0):
    n, start = int(n), int(start)
    out, cand = [], max(2, start)
    while len(out) < n:
        is_p = cand >= 2 and all(cand % d for d in range(2, int(cand**0.5) + 1))
        if is_p:
            out.append(float(cand))
        cand += 1
    return np.asarray(out)


def _pair_sort(a, b):
    """PairSortEvaluator: sort both vectors by the first; returns a 2-row
    matrix [sorted_a; b reordered alongside]."""
    va, vb = _pair(a, b, "pairSort")
    order = np.argsort(va, kind="stable")
    return np.vstack([va[order], vb[order]])


def _normalize_sum(v, sum_to=1.0):
    a = _vec(v, "normalizeSum")
    return a * (float(sum_to) / a.sum())


def _min_max_scale(v, lo=0.0, hi=1.0):
    a = _vec(v, "minMaxScale")
    amin, amax = a.min(), a.max()
    if amax == amin:
        return np.full(len(a), float(lo))
    return (a - amin) / (amax - amin) * (float(hi) - float(lo)) + float(lo)


def _earth_movers(a, b):
    """1-D earth-mover (Wasserstein-1) over two equal-length histograms:
    sum of |cumulative difference|."""
    va, vb = _pair(a, b, "earthMovers")
    return float(np.abs(np.cumsum(va - vb)).sum())


def _distance(a, b=None):
    if b is not None:
        return float(np.linalg.norm(np.subtract(*_pair(a, b, "distance"))))
    m = np.asarray(a, dtype=np.float64)
    if m.ndim != 2:
        raise MathExprError("distance(matrix) expects a matrix")
    # pairwise euclidean between ROWS (reference distance(matrix) contract)
    sq = (m * m).sum(axis=1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (m @ m.T), 0.0)
    return np.sqrt(d2)


# ---------------------------------------------------------------------------
# Matrices (Matrix/Transpose/RowAt/ColumnAt/RowCount/ColumnCount/
# MatrixMultiply/SumRows/SumColumns/GrandSum/Scalar* in io/eval/).
# cov()/corr() gain the reference's single-matrix-argument form
# (columns are the variables).
# ---------------------------------------------------------------------------


def _matrix(*rows):
    vs = [_vec(r, "matrix") for r in rows]
    if not vs or len({len(v) for v in vs}) != 1:
        raise MathExprError("matrix() needs >=1 equal-length row vectors")
    return np.vstack(vs)


def _as_matrix(m, name):
    a = np.asarray(m, dtype=np.float64)
    if a.ndim != 2:
        raise MathExprError(f"{name} expects a matrix")
    return a


def _corr2(a, b=None):
    if b is None:
        return np.corrcoef(_as_matrix(a, "corr"), rowvar=False)
    return _corr(a, b)


def _cov2(a, b=None):
    if b is None:
        return np.cov(_as_matrix(a, "cov"), rowvar=False, ddof=1)
    return _cov(a, b)


def _scalar_op(op):
    def fn(c, x):
        return op(np.asarray(x, dtype=np.float64), float(c))

    return fn


# ---------------------------------------------------------------------------
# Signal / time series (ExponentialMovingAverage/MovingMAD/Lerp/Spline/
# Derivative/Integrate/PolyFit/Convolution/FindDelay/Oscillate/FFT/IFFT).
# Interpolators and regressors return MODEL dicts consumed by predict()/
# derivative()/integrate() — same dataflow as the reference's VectorFunction
# wrappers.
# ---------------------------------------------------------------------------


def _exp_moving_avg(v, w):
    """EMA with alpha = 2/(w+1), seeded at v[0] (commons-math / the
    reference's expMovingAge contract); full-length output."""
    a = _vec(v, "expMovingAvg")
    w = int(w)
    if w < 1:
        raise MathExprError("expMovingAvg window must be >= 1")
    alpha = 2.0 / (w + 1.0)
    out = np.empty(len(a))
    acc = a[0]
    for i, x in enumerate(a):
        acc = alpha * x + (1.0 - alpha) * acc if i else x
        out[i] = acc
    return out


def _moving_mad(v, w):
    """Moving MAD: median(|x - median(window)|) per trailing window."""
    a = _vec(v, "movingMAD")
    w = int(w)
    if w < 1 or w > len(a):
        raise MathExprError("movingMAD window out of range")
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(a, w)
    med = np.median(win, axis=1)
    return np.median(np.abs(win - med[:, None]), axis=1)


def _lerp(x, y):
    xs, ys = _pair(x, y, "lerp")
    order = np.argsort(xs, kind="stable")
    return {"type": "lerp", "x": xs[order], "y": ys[order]}


def _spline(x, y):
    """Natural cubic spline: solves the standard tridiagonal system for the
    second derivatives m_i (m_0 = m_n = 0)."""
    xs, ys = _pair(x, y, "spline")
    order = np.argsort(xs, kind="stable")
    xs, ys = xs[order], ys[order]
    n = len(xs)
    if n < 3:
        raise MathExprError("spline needs >= 3 points")
    h = np.diff(xs)
    if (h <= 0).any():
        raise MathExprError("spline needs strictly increasing x")
    # tridiagonal: sub=h[i-1], diag=2(h[i-1]+h[i]), sup=h[i], rhs=6*(slope diff)
    diag = 2.0 * (h[:-1] + h[1:])
    rhs = 6.0 * (np.diff(ys[1:]) / h[1:] - np.diff(ys[:-1]) / h[:-1])
    m = np.zeros(n)
    if n > 2:
        # Thomas algorithm
        cp = np.zeros(n - 2)
        dp = np.zeros(n - 2)
        cp[0] = h[1] / diag[0]
        dp[0] = rhs[0] / diag[0]
        for i in range(1, n - 2):
            den = diag[i] - h[i] * cp[i - 1]
            cp[i] = h[i + 1] / den if i < n - 3 else 0.0
            dp[i] = (rhs[i] - h[i] * dp[i - 1]) / den
        m[n - 2] = dp[-1]
        for i in range(n - 3, 0, -1):
            m[i] = dp[i - 1] - cp[i - 1] * m[i + 1]
    return {"type": "spline", "x": xs, "y": ys, "m": m}


def _spline_eval(model, xq):
    xs, ys, m = model["x"], model["y"], model["m"]
    xq = np.atleast_1d(np.asarray(xq, dtype=np.float64))
    idx = np.clip(np.searchsorted(xs, xq) - 1, 0, len(xs) - 2)
    h = xs[idx + 1] - xs[idx]
    t = xq - xs[idx]
    a = (xs[idx + 1] - xq) / h
    b = t / h
    out = (
        a * ys[idx]
        + b * ys[idx + 1]
        + ((a**3 - a) * m[idx] + (b**3 - b) * m[idx + 1]) * h * h / 6.0
    )
    return out


def _derivative(model):
    if not (isinstance(model, dict) and model.get("type") in ("lerp", "spline")):
        raise MathExprError("derivative() expects a lerp()/spline() model")
    return {"type": "deriv", "of": model}


def _integrate(model, lo, hi):
    """Definite integral of an interpolator: exact trapezoid for lerp,
    composite Simpson (513 points) for spline."""
    lo, hi = float(lo), float(hi)
    if not isinstance(model, dict):
        raise MathExprError("integrate() expects an interpolator model")
    if model.get("type") == "lerp":
        xs, ys = model["x"], model["y"]
        grid = np.unique(np.concatenate([[lo], xs[(xs > lo) & (xs < hi)], [hi]]))
        vals = np.interp(grid, xs, ys)
        return float(np.trapz(vals, grid))
    if model.get("type") == "spline":
        grid = np.linspace(lo, hi, 513)
        vals = _spline_eval(model, grid)
        h = grid[1] - grid[0]
        return float(h / 3.0 * (vals[0] + vals[-1] + 4 * vals[1:-1:2].sum() + 2 * vals[2:-2:2].sum()))
    raise MathExprError("integrate() supports lerp/spline models")


def _polyfit(v, deg=3):
    """PolyFitEvaluator: least-squares polynomial of degree `deg` fitted
    against the natural sequence x = 0..n-1; returns the FITTED values
    (the reference's polyfit plots the smoothed curve)."""
    a = _vec(v, "polyfit")
    x = np.arange(len(a), dtype=np.float64)
    coeffs = np.polyfit(x, a, int(deg))
    return np.polyval(coeffs, x)


def _find_delay(a, b):
    """FindDelayEvaluator: lag of b relative to a maximizing the
    cross-correlation sum_t a[t] * b[t - d]."""
    va, vb = _vec(a, "finddelay"), _vec(b, "finddelay")
    xc = np.correlate(va, vb, mode="full")
    return float(int(np.argmax(xc)) - (len(vb) - 1))


def _oscillate(amp, omega, phase, n=128):
    t = np.arange(int(n), dtype=np.float64)
    return float(amp) * np.sin(float(omega) * t + float(phase))


def _fft(v):
    a = _vec(v, "fft")
    z = np.fft.fft(a)
    return np.vstack([z.real, z.imag])


def _ifft(m):
    mm = _as_matrix(m, "ifft")
    if mm.shape[0] != 2:
        raise MathExprError("ifft expects the 2-row [real; imag] matrix fft() emits")
    return np.fft.ifft(mm[0] + 1j * mm[1]).real


# ---------------------------------------------------------------------------
# Probability distributions (NormalDistribution/UniformDistribution/
# UniformIntegerDistribution/BinomialDistribution/PoissonDistribution/
# TriangularDistribution/ConstantDistribution/EmpiricalDistribution/
# EnumeratedDistribution/ZipFDistribution in io/eval/) with the operations
# density() / probability() / cumulativeProbability() / sample().
# sample() is SEEDED (fixed rng) so catalog entries stay deterministic —
# the reference samples unseeded; stated divergence.
# ---------------------------------------------------------------------------

_SAMPLE_SEED = 20260818
#: per-iteration seed offset set by monteCarlo() so each lazy re-evaluation
#: draws fresh (but deterministic) samples; 0 everywhere else
_MC_OFFSET = 0


def _d_normal(mean, sd):
    return {"dist": "normal", "mean": float(mean), "sd": float(sd)}


def _d_uniform(lo, hi):
    return {"dist": "uniform", "lo": float(lo), "hi": float(hi)}


def _d_uniform_int(lo, hi):
    return {"dist": "uniformInt", "lo": int(lo), "hi": int(hi)}


def _d_binomial(trials, p):
    return {"dist": "binomial", "n": int(trials), "p": float(p)}


def _d_poisson(mean):
    return {"dist": "poisson", "lam": float(mean)}


def _d_triangular(lo, mode, hi):
    return {"dist": "triangular", "lo": float(lo), "mode": float(mode), "hi": float(hi)}


def _d_constant(c):
    return {"dist": "constant", "c": float(c)}


def _d_empirical(v):
    return {"dist": "empirical", "sorted": np.sort(_vec(v, "empiricalDistribution"))}


def _d_enumerated(values, probs=None):
    vals = _vec(values, "enumeratedDistribution")
    if probs is None:
        uv, counts = np.unique(vals, return_counts=True)
        return {"dist": "enumerated", "values": uv, "probs": counts / counts.sum()}
    pr = _vec(probs, "enumeratedDistribution")
    if len(pr) != len(vals) or (pr < 0).any():
        raise MathExprError("enumeratedDistribution: bad probability vector")
    return {"dist": "enumerated", "values": vals, "probs": pr / pr.sum()}


def _d_zipf(size, exponent):
    n, s = int(size), float(exponent)
    k = np.arange(1, n + 1, dtype=np.float64)
    w = k ** (-s)
    return {"dist": "enumerated", "values": k, "probs": w / w.sum(), "zipf": True}


def _is_dist(d):
    return isinstance(d, dict) and "dist" in d


def _binom_pmf(n, p, k):
    if k < 0 or k > n:
        return 0.0
    if p == 0.0:
        return 1.0 if k == 0 else 0.0
    if p == 1.0:
        return 1.0 if k == n else 0.0
    return math.exp(
        math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)
        + k * math.log(p) + (n - k) * math.log1p(-p)
    )


def _poisson_pmf(lam, k):
    if k < 0:
        return 0.0
    return math.exp(k * math.log(lam) - lam - math.lgamma(k + 1)) if lam > 0 else float(k == 0)


def _dist_density(d, x):
    if not _is_dist(d):
        raise MathExprError("density(dist, x) expects a distribution")
    x = float(x)
    kind = d["dist"]
    if kind == "normal":
        z = (x - d["mean"]) / d["sd"]
        return math.exp(-0.5 * z * z) / (d["sd"] * math.sqrt(2 * math.pi))
    if kind == "uniform":
        return 1.0 / (d["hi"] - d["lo"]) if d["lo"] <= x <= d["hi"] else 0.0
    if kind == "triangular":
        lo, mo, hi = d["lo"], d["mode"], d["hi"]
        if x < lo or x > hi:
            return 0.0
        if x < mo:
            return 2.0 * (x - lo) / ((hi - lo) * (mo - lo))
        if x > mo:
            return 2.0 * (hi - x) / ((hi - lo) * (hi - mo))
        return 2.0 / (hi - lo)
    raise MathExprError(f"density() undefined for {kind!r} (discrete: use probability())")


def _dist_probability(d, x, x2=None):
    """Discrete: P(X = x). Continuous: probability(d, lo, hi) = CDF(hi)-CDF(lo)
    (the reference's two-arg continuous form)."""
    if not _is_dist(d):
        raise MathExprError("probability(dist, ...) expects a distribution")
    kind = d["dist"]
    if kind in ("binomial", "poisson", "uniformInt", "enumerated", "constant"):
        k = float(x)
        if kind == "binomial":
            return _binom_pmf(d["n"], d["p"], int(round(k))) if float(k).is_integer() else 0.0
        if kind == "poisson":
            return _poisson_pmf(d["lam"], int(round(k))) if float(k).is_integer() else 0.0
        if kind == "uniformInt":
            return 1.0 / (d["hi"] - d["lo"] + 1) if d["lo"] <= k <= d["hi"] and k.is_integer() else 0.0
        if kind == "constant":
            return 1.0 if k == d["c"] else 0.0
        hit = d["values"] == k
        return float(d["probs"][hit].sum())
    if x2 is None:
        raise MathExprError("probability(continuousDist, lo, hi) needs two bounds")
    return _dist_cum(d, x2) - _dist_cum(d, x)


def _dist_cum(d, x):
    if not _is_dist(d):
        raise MathExprError("cumulativeProbability(dist, x) expects a distribution")
    x = float(x)
    kind = d["dist"]
    if kind == "normal":
        return norm_cdf(x, d["mean"], d["sd"])
    if kind == "uniform":
        return min(max((x - d["lo"]) / (d["hi"] - d["lo"]), 0.0), 1.0)
    if kind == "uniformInt":
        k = math.floor(x)
        return min(max((k - d["lo"] + 1) / (d["hi"] - d["lo"] + 1), 0.0), 1.0)
    if kind == "binomial":
        k = math.floor(x)
        if k < 0:
            return 0.0
        if k >= d["n"]:
            return 1.0
        # P(X<=k) = I_{1-p}(n-k, k+1)
        return betainc(d["n"] - k, k + 1, 1.0 - d["p"])
    if kind == "poisson":
        k = math.floor(x)
        if k < 0:
            return 0.0
        # P(X<=k) = Q(k+1, lam) = 1 - P_reg(k+1, lam)
        return 1.0 - gammainc_p(k + 1.0, d["lam"])
    if kind == "triangular":
        lo, mo, hi = d["lo"], d["mode"], d["hi"]
        if x <= lo:
            return 0.0
        if x >= hi:
            return 1.0
        if x <= mo:
            return (x - lo) ** 2 / ((hi - lo) * (mo - lo))
        return 1.0 - (hi - x) ** 2 / ((hi - lo) * (hi - mo))
    if kind == "constant":
        return 1.0 if x >= d["c"] else 0.0
    if kind == "empirical":
        s = d["sorted"]
        return float(np.searchsorted(s, x, side="right") / len(s))
    if kind == "enumerated":
        return float(d["probs"][d["values"] <= x].sum())
    raise MathExprError(f"cumulativeProbability() undefined for {kind!r}")


def _dist_sample(d, n=1):
    if not _is_dist(d):
        raise MathExprError("sample(dist[, n]) expects a distribution")
    rng = np.random.default_rng(_SAMPLE_SEED + _MC_OFFSET)
    n = int(n)
    kind = d["dist"]
    if kind == "normal":
        out = rng.normal(d["mean"], d["sd"], n)
    elif kind == "uniform":
        out = rng.uniform(d["lo"], d["hi"], n)
    elif kind == "uniformInt":
        out = rng.integers(d["lo"], d["hi"] + 1, n).astype(np.float64)
    elif kind == "binomial":
        out = rng.binomial(d["n"], d["p"], n).astype(np.float64)
    elif kind == "poisson":
        out = rng.poisson(d["lam"], n).astype(np.float64)
    elif kind == "triangular":
        out = rng.triangular(d["lo"], d["mode"], d["hi"], n)
    elif kind == "constant":
        out = np.full(n, d["c"])
    elif kind == "empirical":
        out = rng.choice(d["sorted"], size=n, replace=True)
    elif kind == "enumerated":
        out = rng.choice(d["values"], size=n, replace=True, p=d["probs"])
    else:
        raise MathExprError(f"sample() undefined for {kind!r}")
    return float(out[0]) if n == 1 else out


# ---------------------------------------------------------------------------
# Regression / ML models (OLSRegression/KnnRegression/Kmeans/GetCentroids/
# GetValue in io/eval/) — model dicts consumed by predict()/getValue().
# ---------------------------------------------------------------------------


def _ols_regress(X, y):
    m = _as_matrix(X, "olsRegress")
    yv = _vec(y, "olsRegress")
    if m.shape[0] != len(yv):
        raise MathExprError("olsRegress: rows(X) != len(y)")
    A = np.hstack([np.ones((m.shape[0], 1)), m])
    beta, *_ = np.linalg.lstsq(A, yv, rcond=None)
    resid = yv - A @ beta
    ss_res = float((resid**2).sum())
    ss_tot = float(((yv - yv.mean()) ** 2).sum())
    return {
        "type": "ols",
        "intercept": float(beta[0]),
        "coeffs": beta[1:],
        "rsquared": 1.0 - ss_res / ss_tot if ss_tot else 1.0,
    }


def _knn_regress(x, y, k):
    xs, ys = _pair(x, y, "knnRegress")
    return {"type": "knn", "x": xs, "y": ys, "k": int(k)}


def _kmeans(m, k, max_iter=25):
    """Lloyd's k-means with kmeans++ init on a fixed rng (deterministic;
    the reference uses commons-math KMeansPlusPlusClusterer)."""
    X = _as_matrix(m, "kmeans")
    k = int(k)
    if not 1 <= k <= X.shape[0]:
        raise MathExprError("kmeans: k out of range")
    rng = np.random.default_rng(_SAMPLE_SEED)
    cents = [X[rng.integers(X.shape[0])]]
    for _ in range(k - 1):
        d2 = np.min([((X - c) ** 2).sum(axis=1) for c in cents], axis=0)
        tot = d2.sum()
        probs = d2 / tot if tot > 0 else np.full(len(d2), 1.0 / len(d2))
        cents.append(X[rng.choice(X.shape[0], p=probs)])
    C = np.vstack(cents)
    labels = np.zeros(X.shape[0], dtype=np.int64)
    for _ in range(int(max_iter)):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        new_labels = d2.argmin(axis=1)
        if (new_labels == labels).all() and _ > 0:
            break
        labels = new_labels
        for j in range(k):
            pts = X[labels == j]
            if len(pts):
                C[j] = pts.mean(axis=0)
    return {"type": "kmeans", "centroids": C, "labels": labels.astype(np.float64)}


def _get_centroids(model):
    if not (isinstance(model, dict) and model.get("type") == "kmeans"):
        raise MathExprError("getCentroids() expects a kmeans() model")
    return model["centroids"]


def _get_value(model, key):
    if not isinstance(model, dict):
        raise MathExprError("getValue(model, key) expects a model/result dict")
    if key not in model:
        raise MathExprError(f"getValue: no field {key!r} (have {sorted(model)})")
    return model[key]


def _predict2(model, x):
    """PredictEvaluator over every model this module produces: simple
    regress {slope,intercept}, lerp/spline interpolators (+ derivative),
    polyfit handled by returning fitted values directly, olsRegress
    (vector = one observation, matrix = many), knnRegress (scalar/vector)."""
    if not isinstance(model, dict):
        raise MathExprError("predict() expects a model dict")
    if "slope" in model:
        return model["slope"] * np.asarray(x, dtype=np.float64) + model["intercept"]
    t = model.get("type")
    if t == "lerp":
        return np.interp(np.asarray(x, dtype=np.float64), model["x"], model["y"])
    if t == "spline":
        out = _spline_eval(model, x)
        return float(out[0]) if np.ndim(x) == 0 else out
    if t == "deriv":
        base = model["of"]
        xq = np.atleast_1d(np.asarray(x, dtype=np.float64))
        eps = 1e-6 * max(1.0, float(np.abs(xq).max()))
        lo = _predict2(base, xq - eps)
        hi = _predict2(base, xq + eps)
        out = (np.asarray(hi) - np.asarray(lo)) / (2 * eps)
        return float(out[0]) if np.ndim(x) == 0 else out
    if t == "ols":
        a = np.asarray(x, dtype=np.float64)
        if a.ndim == 1:
            return float(model["intercept"] + a @ model["coeffs"])
        return model["intercept"] + a @ model["coeffs"]
    if t == "knn":
        xq = np.atleast_1d(np.asarray(x, dtype=np.float64))
        out = np.empty(len(xq))
        for i, q in enumerate(xq):
            idx = np.argsort(np.abs(model["x"] - q), kind="stable")[: model["k"]]
            out[i] = model["y"][idx].mean()
        return float(out[0]) if np.ndim(x) == 0 else out
    raise MathExprError(f"predict() does not understand model type {t!r}")


# ---------------------------------------------------------------------------
# Registry — evaluator-name -> callable, extending the core EVALS table.
# Boolean/comparison evaluators return 0/1 floats (vectors elementwise);
# if() is IfThenElseEvaluator (eager, np.where on vectors).
# ---------------------------------------------------------------------------

_LITERAL_STR_FNS = {"getValue"}


def _truthy(x):
    return np.asarray(x, dtype=np.float64) != 0


EVALS.update(
    {
        # scalar math / trig (Sine..HyperbolicTangent, CubedRoot, Modulo,
        # Factorial, BinomialCoefficient, Recip)
        "sin": lambda x: np.sin(np.asarray(x, np.float64)),
        "cos": lambda x: np.cos(np.asarray(x, np.float64)),
        "tan": lambda x: np.tan(np.asarray(x, np.float64)),
        "asin": lambda x: np.arcsin(np.asarray(x, np.float64)),
        "acos": lambda x: np.arccos(np.asarray(x, np.float64)),
        "atan": lambda x: np.arctan(np.asarray(x, np.float64)),
        "sinh": lambda x: np.sinh(np.asarray(x, np.float64)),
        "cosh": lambda x: np.cosh(np.asarray(x, np.float64)),
        "tanh": lambda x: np.tanh(np.asarray(x, np.float64)),
        "cbrt": lambda x: np.cbrt(np.asarray(x, np.float64)),
        "mod": lambda a, b: np.mod(np.asarray(a, np.float64), np.asarray(b, np.float64)),
        "recip": lambda x: 1.0 / np.asarray(x, np.float64),
        "factorial": lambda n: float(math.factorial(int(n))),
        "binomialCoefficient": lambda n, k: float(math.comb(int(n), int(k))),
        # boolean / comparison / conditional
        "and": lambda *xs: np.logical_and.reduce([_truthy(x) for x in xs]).astype(np.float64),
        "or": lambda *xs: np.logical_or.reduce([_truthy(x) for x in xs]).astype(np.float64),
        "not": lambda x: np.logical_not(_truthy(x)).astype(np.float64),
        "eor": lambda a, b: np.logical_xor(_truthy(a), _truthy(b)).astype(np.float64),
        "eq": lambda a, b: (np.asarray(a, np.float64) == np.asarray(b, np.float64)).astype(np.float64),
        "gt": lambda a, b: (np.asarray(a, np.float64) > np.asarray(b, np.float64)).astype(np.float64),
        "gte": lambda a, b: (np.asarray(a, np.float64) >= np.asarray(b, np.float64)).astype(np.float64),
        "lt": lambda a, b: (np.asarray(a, np.float64) < np.asarray(b, np.float64)).astype(np.float64),
        "lte": lambda a, b: (np.asarray(a, np.float64) <= np.asarray(b, np.float64)).astype(np.float64),
        "if": lambda c, a, b: np.where(_truthy(c), np.asarray(a, np.float64), np.asarray(b, np.float64))
        if np.ndim(c) > 0
        else (a if float(np.asarray(c)) != 0 else b),
        # vector utilities
        "copyOf": _copy_of,
        "copyOfRange": _copy_of_range,
        "valueAt": _value_at,
        "zeros": lambda n: np.zeros(int(n)),
        "ones": lambda n: np.ones(int(n)),
        "natural": lambda n: np.arange(int(n), dtype=np.float64),
        "primes": _primes,
        "asc": lambda v: np.sort(_vec(v, "asc"), kind="stable"),
        "pairSort": _pair_sort,
        "rank": _rank,
        # norms / scaling
        "l1norm": lambda v: float(np.abs(_vec(v, "l1norm")).sum()),
        "norm": lambda v: float(np.linalg.norm(_vec(v, "norm"))),
        "l2norm": lambda v: float(np.linalg.norm(_vec(v, "l2norm"))),
        "linfnorm": lambda v: float(np.abs(_vec(v, "linfnorm")).max()),
        "normalizeSum": _normalize_sum,
        "minMaxScale": _min_max_scale,
        "standardize": _zscores,
        # distances
        "manhattan": lambda a, b: float(np.abs(np.subtract(*_pair(a, b, "manhattan"))).sum()),
        "canberra": lambda a, b: float(
            np.nansum(
                np.abs(np.subtract(*_pair(a, b, "canberra")))
                / (np.abs(np.asarray(a, np.float64)) + np.abs(np.asarray(b, np.float64)))
            )
        ),
        "chebyshev": lambda a, b: float(np.abs(np.subtract(*_pair(a, b, "chebyshev"))).max()),
        "cosine": lambda a, b: EVALS["cosineSimilarity"](a, b),
        "earthMovers": _earth_movers,
        "distance": _distance,
        # statistics II
        "geometricMean": _geometric_mean,
        "harmonicMean": _harmonic_mean,
        "sumSq": lambda v: float((_vec(v, "sumSq") ** 2).sum()),
        "mode": _mode,
        "median": lambda v: float(np.median(_vec(v, "median"))),
        "meanDifference": lambda a, b: float(np.subtract(*_pair(a, b, "meanDifference")).mean()),
        "sumDifference": lambda a, b: float(np.subtract(*_pair(a, b, "sumDifference")).sum()),
        "freqTable": _freq_table,
        "anova": _anova,
        "mannWhitney": _mann_whitney,
        "ks": _ks,
        "pairedTtest": _paired_ttest,
        "chiSquareDataSet": _chisq_dataset,
        # matrices
        "matrix": _matrix,
        "transpose": lambda m: _as_matrix(m, "transpose").T.copy(),
        "rowAt": lambda m, i: _as_matrix(m, "rowAt")[int(i)].copy(),
        "columnAt": lambda m, j: _as_matrix(m, "columnAt")[:, int(j)].copy(),
        "rowCount": lambda m: float(_as_matrix(m, "rowCount").shape[0]),
        "columnCount": lambda m: float(_as_matrix(m, "columnCount").shape[1]),
        "matrixMult": lambda a, b: _as_matrix(a, "matrixMult") @ _as_matrix(b, "matrixMult"),
        "sumRows": lambda m: _as_matrix(m, "sumRows").sum(axis=1),
        "sumColumns": lambda m: _as_matrix(m, "sumColumns").sum(axis=0),
        "grandSum": lambda m: float(_as_matrix(m, "grandSum").sum()),
        "scalarAdd": _scalar_op(lambda x, c: x + c),
        "scalarSubtract": _scalar_op(lambda x, c: x - c),
        "scalarMultiply": _scalar_op(lambda x, c: x * c),
        "scalarDivide": _scalar_op(lambda x, c: x / c),
        # signal / time series
        "expMovingAvg": _exp_moving_avg,
        "movingMAD": _moving_mad,
        "lerp": _lerp,
        "spline": _spline,
        "derivative": _derivative,
        "integrate": _integrate,
        "polyfit": _polyfit,
        "conv": lambda a, b: np.convolve(_vec(a, "conv"), _vec(b, "conv")),
        "finddelay": _find_delay,
        "oscillate": _oscillate,
        "fft": _fft,
        "ifft": _ifft,
        # distributions
        "normalDistribution": _d_normal,
        "uniformDistribution": _d_uniform,
        "uniformIntegerDistribution": _d_uniform_int,
        "binomialDistribution": _d_binomial,
        "poissonDistribution": _d_poisson,
        "triangularDistribution": _d_triangular,
        "constantDistribution": _d_constant,
        "empiricalDistribution": _d_empirical,
        "enumeratedDistribution": _d_enumerated,
        "zipFDistribution": _d_zipf,
        "density": _dist_density,
        "probability": _dist_probability,
        "cumulativeProbability": _dist_cum,
        "sample": _dist_sample,
        # regression / ML
        "olsRegress": _ols_regress,
        "knnRegress": _knn_regress,
        "kmeans": _kmeans,
        "getCentroids": _get_centroids,
        "getValue": _get_value,
    }
)

# single-matrix-argument forms of corr()/cov() (reference CorrelationEvaluator
# and CovarianceEvaluator accept a matrix whose COLUMNS are the variables)
EVALS["corr"] = _corr2
EVALS["cov"] = _cov2
EVALS["predict"] = _predict2


# =============================================================================
# Round-5 wave: closing the io/eval name gap against Lang.java's registry.
# Each group cites its reference evaluator class.
# =============================================================================


def _str_or_list(x, fn):
    if isinstance(x, str):
        return fn(x)
    if isinstance(x, (list, tuple, np.ndarray)) and len(x) and isinstance(x[0], str):
        return [fn(s) for s in x]
    raise MathExprError("string evaluator expects a string or string list")


def _m_matches(x, pattern):
    """MatchesEvaluator: regex search."""
    import re as _re

    rx = _re.compile(str(pattern))
    return _str_or_list(x, lambda s: float(bool(rx.search(s))))


def _m_index_of(v, x):
    """IndexOfEvaluator: first index of x in the vector, -1 if absent."""
    a = _vec(v, "indexOf")
    hits = np.nonzero(a == float(x))[0]
    return float(hits[0]) if len(hits) else -1.0


def _m_repeat(x, n):
    """RepeatEvaluator."""
    return np.full(int(n), float(x))


def _m_ltrim(v, n):
    """LeftShiftEvaluator (registered as ltrim): drop n from the left."""
    return _vec(v, "ltrim")[int(n):]


def _m_rtrim(v, n):
    """RightShiftEvaluator (registered as rtrim): drop n from the right."""
    a = _vec(v, "rtrim")
    k = int(n)
    return a[:-k] if k > 0 else a


def _m_add_all(*vs):
    """AppendEvaluator (registered as addAll/append): concatenate vectors."""
    return np.concatenate([_vec(v, "addAll") for v in vs])


def _m_outliers(d, v, lo, hi):
    """OutliersEvaluator: values of v whose CDF under the distribution is
    below lo or above hi."""
    if not _is_dist(d):
        raise MathExprError("outliers(dist, vec, lowProb, highProb)")
    a = _vec(v, "outliers")
    cdf = np.array([_dist_cum(d, float(x)) for x in a])
    return a[(cdf < float(lo)) | (cdf > float(hi))]


def _m_top_features(m, k):
    """TopFeaturesEvaluator: per row, the indices of the k largest values."""
    X = _as_matrix(m, "topFeatures")
    k = int(k)
    idx = np.argsort(-X, axis=1, kind="stable")[:, :k]
    return idx.astype(np.float64)


def _m_feature_select(m, idx):
    """FeatureSelectEvaluator: select matrix columns by index vector."""
    X = _as_matrix(m, "featureSelect")
    return X[:, _vec(idx, "featureSelect").astype(int)]


def _m_set_value(model, key, val):
    """SetValueEvaluator: copy of a map/model with one key replaced."""
    if not isinstance(model, dict):
        raise MathExprError("setValue(map, key, value) expects a map")
    out = dict(model)
    out[str(key)] = val
    return out


def _m_coalesce(*xs):
    """CoalesceEvaluator: first non-null / non-NaN operand."""
    for x in xs:
        if x is None:
            continue
        if np.ndim(x) == 0 and isinstance(x, float) and math.isnan(x):
            continue
        return x
    return None


def _m_uuid(seed=None):
    """UuidEvaluator. DIVERGENCE, stated: the reference generates a random
    UUID; catalog determinism requires a seed, so uuid(seed) is UUIDv5 of
    the seed text and the zero-arg form raises."""
    import uuid as _uuid

    if seed is None:
        raise MathExprError("uuid() here requires a seed argument (determinism)")
    return str(_uuid.uuid5(_uuid.NAMESPACE_URL, str(seed)))


def _m_date_time(v, fmt):
    """DateTimeEvaluator (TemporalEvaluator* family): format epoch-seconds
    with a Java-pattern subset (yyyy MM dd HH mm ss DDD EEE)."""
    from datetime import datetime, timezone

    mapping = [
        ("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"), ("HH", "%H"),
        ("mm", "%M"), ("ss", "%S"), ("DDD", "%j"), ("EEE", "%a"),
    ]
    py = str(fmt)
    for j, p in mapping:
        py = py.replace(j, p)

    def one(sec: float) -> str:
        return datetime.fromtimestamp(float(sec), tz=timezone.utc).strftime(py)

    a = np.atleast_1d(np.asarray(v, dtype=np.float64))
    out = [one(s) for s in a]
    return out[0] if np.ndim(v) == 0 else out


def _m_gtest(obs, expected):
    """GTestDataSetEvaluator: G-test of goodness of fit,
    G = 2 * sum(O * ln(O/E)); p-value from the chi-square CDF (df = k-1)."""
    o, e = _pair(obs, expected, "gtestDataSet")
    if (o < 0).any() or (e <= 0).any():
        raise MathExprError("gtestDataSet: counts must be >=0 with positive expected")
    mask = o > 0
    g = 2.0 * float(np.sum(o[mask] * np.log(o[mask] / e[mask])))
    df = len(o) - 1
    p = 1.0 - gammainc_p(df / 2.0, g / 2.0)
    return {"G-statistic": g, "p-value": p}


# -- distributions (BetaDistribution/GammaDistribution/GeometricDistribution/
# -- LogNormalDistribution/WeibullDistribution in io/eval/) -------------------


def _d_beta(alpha, beta):
    return {"dist": "beta", "a": float(alpha), "b": float(beta)}


def _d_gamma(shape, scale):
    return {"dist": "gamma", "k": float(shape), "theta": float(scale)}


def _d_geometric(p):
    return {"dist": "geometric", "p": float(p)}


def _d_lognormal(mu, sigma):
    return {"dist": "lognormal", "mu": float(mu), "sigma": float(sigma)}


def _d_weibull(shape, scale):
    return {"dist": "weibull", "k": float(shape), "lam": float(scale)}


def _lbeta(a, b):
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


def _ext_density(d, x):
    x = float(x)
    kind = d["dist"] if _is_dist(d) else None
    if kind == "beta":
        a, b = d["a"], d["b"]
        if not 0.0 < x < 1.0:
            return 0.0
        return math.exp((a - 1) * math.log(x) + (b - 1) * math.log1p(-x) - _lbeta(a, b))
    if kind == "gamma":
        k, th = d["k"], d["theta"]
        if x <= 0:
            return 0.0
        return math.exp((k - 1) * math.log(x) - x / th - math.lgamma(k) - k * math.log(th))
    if kind == "lognormal":
        mu, sg = d["mu"], d["sigma"]
        if x <= 0:
            return 0.0
        z = (math.log(x) - mu) / sg
        return math.exp(-0.5 * z * z) / (x * sg * math.sqrt(2 * math.pi))
    if kind == "weibull":
        k, lam = d["k"], d["lam"]
        if x < 0:
            return 0.0
        return (k / lam) * (x / lam) ** (k - 1) * math.exp(-((x / lam) ** k))
    return None


def _ext_cum(d, x):
    x = float(x)
    kind = d["dist"] if _is_dist(d) else None
    if kind == "beta":
        if x <= 0:
            return 0.0
        if x >= 1:
            return 1.0
        return betainc(d["a"], d["b"], x)
    if kind == "gamma":
        return gammainc_p(d["k"], x / d["theta"]) if x > 0 else 0.0
    if kind == "geometric":
        k = math.floor(x)
        return 1.0 - (1.0 - d["p"]) ** (k + 1) if k >= 0 else 0.0
    if kind == "lognormal":
        return norm_cdf(math.log(x), d["mu"], d["sigma"]) if x > 0 else 0.0
    if kind == "weibull":
        return 1.0 - math.exp(-((x / d["lam"]) ** d["k"])) if x > 0 else 0.0
    return None


def _ext_probability(d, x, x2=None):
    if _is_dist(d) and d["dist"] == "geometric":
        k = float(x)
        if k < 0 or not k.is_integer():
            return 0.0
        return d["p"] * (1.0 - d["p"]) ** int(k)
    return None


def _ext_sample(d, rng, n):
    kind = d["dist"] if _is_dist(d) else None
    if kind == "beta":
        return rng.beta(d["a"], d["b"], n)
    if kind == "gamma":
        return rng.gamma(d["k"], d["theta"], n)
    if kind == "geometric":
        return (rng.geometric(d["p"], n) - 1).astype(np.float64)  # failures before success
    if kind == "lognormal":
        return rng.lognormal(d["mu"], d["sigma"], n)
    if kind == "weibull":
        return d["lam"] * rng.weibull(d["k"], n)
    if kind == "markov":
        P = d["P"]
        state = int(d["start"])
        out = np.empty(n)
        for i in range(n):
            state = int(rng.choice(len(P), p=P[state]))
            out[i] = state
        return out
    return None


def _d_markov(m, start=0):
    """MarkovChainEvaluator: transition-matrix model; sample(mc, n) walks
    the chain (seeded — stated divergence, as with every sample())."""
    P = _as_matrix(m, "markovChain")
    if P.shape[0] != P.shape[1] or not np.allclose(P.sum(axis=1), 1.0, atol=1e-9):
        raise MathExprError("markovChain expects a square row-stochastic matrix")
    return {"dist": "markov", "P": P, "start": int(start)}


# chain the extended families into the shared density/cum/probability/sample
_base_density, _base_cum, _base_prob, _base_sample = (
    EVALS["density"], EVALS["cumulativeProbability"], EVALS["probability"], EVALS["sample"],
)


def _density_all(d, x):
    r = _ext_density(d, x)
    return r if r is not None else _base_density(d, x)


def _cum_all(d, x):
    r = _ext_cum(d, x)
    return r if r is not None else _base_cum(d, x)


def _prob_all(d, x, x2=None):
    r = _ext_probability(d, x, x2)
    if r is not None:
        return r
    if _is_dist(d) and d["dist"] in ("beta", "gamma", "lognormal", "weibull"):
        if x2 is None:
            raise MathExprError("probability(continuousDist, lo, hi) needs two bounds")
        return _cum_all(d, x2) - _cum_all(d, x)
    return _base_prob(d, x) if x2 is None else _base_prob(d, x, x2)


def _sample_all(d, n=1):
    if _is_dist(d) and d["dist"] in ("beta", "gamma", "geometric", "lognormal", "weibull", "markov"):
        rng = np.random.default_rng(_SAMPLE_SEED + _MC_OFFSET)
        out = _ext_sample(d, rng, int(n))
        return float(out[0]) if int(n) == 1 else out
    return _base_sample(d, n)


# -- fitting / smoothing (Loess/GaussFit/HarmonicFit/Akima in io/eval/) -------


def _m_loess(x, y=None, bandwidth=0.25):
    """LoessEvaluator: tricube-weighted local linear regression; returns the
    smoothed values at the input xs (what the reference emits)."""
    if y is None:
        yv = _vec(x, "loess")
        xv = np.arange(len(yv), dtype=np.float64)
    else:
        xv, yv = _pair(x, y, "loess")
    n = len(xv)
    span = max(2, int(math.ceil(float(bandwidth) * n)))
    out = np.empty(n)
    for i in range(n):
        d = np.abs(xv - xv[i])
        idx = np.argsort(d, kind="stable")[:span]
        dmax = d[idx].max() or 1.0
        w = (1 - (d[idx] / dmax) ** 3) ** 3
        xw, yw = xv[idx], yv[idx]
        sw, sx = w.sum(), (w * xw).sum()
        sxx, sxy, sy = (w * xw * xw).sum(), (w * xw * yw).sum(), (w * yw).sum()
        den = sw * sxx - sx * sx
        if abs(den) < 1e-12:
            out[i] = sy / sw
        else:
            b = (sw * sxy - sx * sy) / den
            a = (sy - b * sx) / sw
            out[i] = a + b * xv[i]
    return out


def _m_gaussfit(x, y=None):
    """GaussFitEvaluator: fit a*exp(-(x-mu)^2/(2 s^2)) by the log-quadratic
    trick (weighted by y to favor the peak); returns the fitted curve."""
    if y is None:
        yv = _vec(x, "gaussfit")
        xv = np.arange(len(yv), dtype=np.float64)
    else:
        xv, yv = _pair(x, y, "gaussfit")
    m = yv > 0
    if m.sum() < 3:
        raise MathExprError("gaussfit needs >= 3 positive points")
    w = yv[m]
    c2, c1, c0 = np.polyfit(xv[m], np.log(yv[m]), 2, w=w)
    if c2 >= 0:
        raise MathExprError("gaussfit: data is not peak-shaped")
    mu = -c1 / (2 * c2)
    s2 = -1.0 / (2 * c2)
    amp = math.exp(c0 - c1 * c1 / (4 * c2))
    return amp * np.exp(-((xv - mu) ** 2) / (2 * s2))


def _m_harmfit(x, y=None):
    """HarmonicFitEvaluator (harmfit): fit a + b sin(wt) + c cos(wt) with w
    from the dominant FFT bin, linear least squares for the rest; returns
    the fitted curve."""
    if y is None:
        yv = _vec(x, "harmfit")
        xv = np.arange(len(yv), dtype=np.float64)
    else:
        xv, yv = _pair(x, y, "harmfit")
    n = len(yv)
    if n < 4:
        raise MathExprError("harmfit needs >= 4 points")
    spec = np.fft.rfft(yv - yv.mean())
    k = int(np.argmax(np.abs(spec[1:])) + 1)

    def fit(w):
        A = np.column_stack([np.ones(n), np.sin(w * xv), np.cos(w * xv)])
        coef, *_ = np.linalg.lstsq(A, yv, rcond=None)
        r = A @ coef
        return float(((yv - r) ** 2).sum()), r

    # the FFT pins the frequency to a bin; refine with a least-squares
    # scan one bin wide on each side (deterministic grid)
    best = (np.inf, yv)
    for w in np.linspace(2 * math.pi * max(k - 1, 0.25) / n, 2 * math.pi * (k + 1) / n, 401):
        sse, r = fit(w)
        if sse < best[0]:
            best = (sse, r)
    return best[1]


def _m_akima(x, y):
    """AkimaEvaluator: Akima (1970) spline model; predict() evaluates it."""
    xv, yv = _pair(x, y, "akima")
    n = len(xv)
    if n < 5:
        raise MathExprError("akima needs >= 5 points")
    order = np.argsort(xv, kind="stable")
    xv, yv = xv[order], yv[order]
    m = np.diff(yv) / np.diff(xv)
    me = np.concatenate([[2 * m[0] - m[1], 2 * (2 * m[0] - m[1]) - m[0]][::-1], m,
                         [2 * m[-1] - m[-2], 2 * (2 * m[-1] - m[-2]) - m[-1]]])
    t = np.empty(n)
    for i in range(n):
        w1 = abs(me[i + 3] - me[i + 2])
        w2 = abs(me[i + 1] - me[i])
        t[i] = (
            (w1 * me[i + 1] + w2 * me[i + 2]) / (w1 + w2)
            if (w1 + w2) > 1e-12
            else 0.5 * (me[i + 1] + me[i + 2])
        )
    return {"type": "akima", "x": xv, "y": yv, "t": t}


def _akima_eval(model, xq):
    x, y, t = model["x"], model["y"], model["t"]
    q = np.atleast_1d(np.asarray(xq, dtype=np.float64))
    i = np.clip(np.searchsorted(x, q, side="right") - 1, 0, len(x) - 2)
    h = x[i + 1] - x[i]
    s = (q - x[i]) / h
    m = (y[i + 1] - y[i]) / h
    p0, p1 = y[i], y[i + 1]
    out = (
        p0 * (1 + 2 * s) * (1 - s) ** 2
        + p1 * (3 - 2 * s) * s**2
        + t[i] * h * s * (1 - s) ** 2
        - t[i + 1] * h * (1 - s) * s**2
    )
    return float(out[0]) if np.ndim(xq) == 0 else out


_base_predict = EVALS["predict"]


def _predict_all(model, x):
    if isinstance(model, dict) and model.get("type") == "akima":
        return _akima_eval(model, x)
    return _base_predict(model, x)


# -- clustering (Dbscan/FuzzyKmeans/MultiKmeans/GetCluster/
# -- GetMembershipMatrix in io/eval/) -----------------------------------------


def _m_dbscan(m, eps, min_pts):
    """DbscanEvaluator: brute-force DBSCAN; labels -1 = noise."""
    X = _as_matrix(m, "dbscan")
    n = len(X)
    D = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=2)
    nbrs = [np.nonzero(D[i] <= float(eps))[0] for i in range(n)]
    labels = np.full(n, -1)
    cid = 0
    for i in range(n):
        if labels[i] != -1 or len(nbrs[i]) < int(min_pts):
            continue
        labels[i] = cid
        stack = list(nbrs[i])
        while stack:
            j = stack.pop()
            if labels[j] == -1:
                labels[j] = cid
                if len(nbrs[j]) >= int(min_pts):
                    stack.extend(int(q) for q in nbrs[j] if labels[q] == -1)
        cid += 1
    return {"type": "kmeans", "centroids": None, "labels": labels.astype(np.float64)}


def _m_fuzzy_kmeans(m, k, fuzziness=2.0, max_iter=25):
    """FuzzyKmeansEvaluator: deterministic-init fuzzy c-means; the model
    carries the membership matrix for getMembershipMatrix()."""
    X = _as_matrix(m, "fuzzyKmeans")
    n, k = len(X), int(k)
    f = float(fuzziness)
    rng = np.random.default_rng(_SAMPLE_SEED)
    U = rng.random((n, k))
    U /= U.sum(axis=1, keepdims=True)
    C = np.zeros((k, X.shape[1]))
    for _ in range(int(max_iter)):
        W = U**f
        C = (W.T @ X) / W.sum(axis=0)[:, None]
        D = np.linalg.norm(X[:, None, :] - C[None, :, :], axis=2) + 1e-12
        inv = D ** (-2.0 / (f - 1))
        U = inv / inv.sum(axis=1, keepdims=True)
    labels = U.argmax(axis=1)
    return {
        "type": "kmeans",
        "centroids": C,
        "labels": labels.astype(np.float64),
        "membership": U,
    }


def _m_multi_kmeans(m, k, trials=5):
    """MultiKmeansEvaluator: kmeans restarts, keep the lowest-inertia run."""
    X = _as_matrix(m, "multiKmeans")
    best, best_inertia = None, np.inf
    for t in range(int(trials)):
        rng = np.random.default_rng(_SAMPLE_SEED + t)
        idx = rng.choice(len(X), size=int(k), replace=False)
        C = X[idx].copy()
        for _ in range(25):
            D = np.linalg.norm(X[:, None, :] - C[None, :, :], axis=2)
            lab = D.argmin(axis=1)
            for j in range(int(k)):
                if (lab == j).any():
                    C[j] = X[lab == j].mean(axis=0)
        inertia = float(((X - C[lab]) ** 2).sum())
        if inertia < best_inertia:
            best_inertia = inertia
            best = {"type": "kmeans", "centroids": C, "labels": lab.astype(np.float64)}
    return best


def _m_get_cluster(model, i):
    """GetClusterEvaluator: the member indices of cluster i."""
    if not (isinstance(model, dict) and "labels" in model):
        raise MathExprError("getCluster() expects a clustering model")
    return np.nonzero(np.asarray(model["labels"]) == float(i))[0].astype(np.float64)


def _m_get_membership(model):
    if not (isinstance(model, dict) and "membership" in model):
        raise MathExprError("getMembershipMatrix() expects a fuzzyKmeans model")
    return model["membership"]


# -- computational geometry (ConvexHull/EnclosingDisk + accessors) ------------


def _m_convex_hull(m):
    """ConvexHullEvaluator: Andrew monotone chain over 2-D points."""
    X = _as_matrix(m, "convexHull")
    if X.shape[1] != 2:
        raise MathExprError("convexHull expects an n x 2 matrix")
    pts = sorted(map(tuple, X))
    if len(pts) < 3:
        raise MathExprError("convexHull needs >= 3 points")

    def half(points):
        out: list = []
        for p in points:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower, upper = half(pts), half(pts[::-1])
    verts = np.array(lower[:-1] + upper[:-1], dtype=np.float64)
    return {"type": "hull", "vertices": verts}


def _hull_only(model, name):
    if not (isinstance(model, dict) and model.get("type") == "hull"):
        raise MathExprError(f"{name}() expects a convexHull() model")
    return model["vertices"]


def _m_get_vertices(model):
    if isinstance(model, dict) and model.get("type") == "disk":
        return model["support"]
    return _hull_only(model, "getVertices")


def _m_get_area(model):
    v = _hull_only(model, "getArea")
    x, y = v[:, 0], v[:, 1]
    return float(0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _m_get_boundary_size(model):
    v = _hull_only(model, "getBoundarySize")
    d = np.diff(np.vstack([v, v[:1]]), axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def _m_get_bary_center(model):
    v = _hull_only(model, "getBaryCenter")
    return v.mean(axis=0)


def _m_enclosing_disk(m):
    """EnclosingDiskEvaluator: Welzl's minimal enclosing circle (iterative,
    deterministic order)."""
    X = _as_matrix(m, "enclosingDisk")
    if X.shape[1] != 2:
        raise MathExprError("enclosingDisk expects an n x 2 matrix")

    def circle2(a, b):
        c = (a + b) / 2
        return c, float(np.linalg.norm(a - c))

    def circle3(a, b, c):
        ax, ay = a
        bx, by = b
        cx, cy = c
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if abs(d) < 1e-12:
            return None
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay) + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx) + (cx**2 + cy**2) * (bx - ax)) / d
        ctr = np.array([ux, uy])
        return ctr, float(np.linalg.norm(a - ctr))

    def inside(circ, p):
        return circ is not None and np.linalg.norm(p - circ[0]) <= circ[1] + 1e-9

    pts = [np.asarray(p, dtype=np.float64) for p in X]
    circ = None
    support: list = []
    for i, p in enumerate(pts):
        if inside(circ, p):
            continue
        circ = (p, 0.0)
        support = [p]
        for j in range(i):
            q = pts[j]
            if inside(circ, q):
                continue
            circ = circle2(p, q)
            support = [p, q]
            for l in range(j):
                r = pts[l]
                if inside(circ, r):
                    continue
                circ = circle3(p, q, r) or circle2(
                    *max(((p, q), (p, r), (q, r)), key=lambda ab: np.linalg.norm(ab[0] - ab[1]))
                )
                support = [p, q, r]
    return {
        "type": "disk",
        "center": circ[0],
        "radius": circ[1],
        "support": np.array(support, dtype=np.float64),
    }


def _disk_only(model, name):
    if not (isinstance(model, dict) and model.get("type") == "disk"):
        raise MathExprError(f"{name}() expects an enclosingDisk() model")
    return model


def _m_corr_pvalues(m):
    """CorrelationSignificanceEvaluator (corrPValues): two-sided p-values
    of a correlation matrix computed by corr(matrix) — t = r sqrt((n-2)/(1-r^2))
    against Student t with n-2 df. corr(matrix) output carries no n, so
    the observation count is the second argument: corrPValues(corrM, n)."""
    raise MathExprError("use corrPValues(corrMatrix, n)")


def _m_corr_pvalues2(m, n):
    R = _as_matrix(m, "corrPValues")
    n = int(n)
    if n <= 2:
        raise MathExprError("corrPValues needs n > 2")
    out = np.zeros_like(R)
    for i in range(R.shape[0]):
        for j in range(R.shape[1]):
            r = min(max(R[i, j], -1.0), 1.0)
            if i == j or abs(r) >= 1.0:
                out[i, j] = 0.0
                continue
            t = abs(r) * math.sqrt((n - 2) / (1.0 - r * r))
            out[i, j] = 2.0 * (1.0 - t_cdf(t, n - 2))
    return out


EVALS.update(
    {
        # comparisons / logic (Lang.java registers gteq/lteq)
        "gteq": EVALS["gte"],
        "lteq": EVALS["lte"],
        # stats / vectors
        "var": lambda v: float(np.var(_vec(v, "var"), ddof=1)),
        "trunc": lambda x: np.trunc(np.asarray(x, dtype=np.float64)) if np.ndim(x) else float(np.trunc(x)),
        "indexOf": _m_index_of,
        "repeat": _m_repeat,
        "ltrim": _m_ltrim,
        "rtrim": _m_rtrim,
        "addAll": _m_add_all,
        "append": _m_add_all,
        "euclidean": EVALS["euclideanDistance"],
        "kolmogorovSmirnov": EVALS["ks"],
        "integral": EVALS["integrate"],
        "colAt": EVALS["columnAt"],
        "outliers": _m_outliers,
        "topFeatures": _m_top_features,
        "featureSelect": _m_feature_select,
        "setValue": _m_set_value,
        "coalesce": _m_coalesce,
        "uuid": _m_uuid,
        "gtestDataSet": _m_gtest,
        "corrPValues": _m_corr_pvalues2,
        # strings (Upper/Lower/Trim/Split/Concat/Matches in io/eval/)
        "upper": lambda x: _str_or_list(x, str.upper),
        "lower": lambda x: _str_or_list(x, str.lower),
        "trim": lambda x: _str_or_list(x, str.strip),
        "split": lambda x, sep: str(x).split(str(sep)),
        "concat": lambda *xs: "".join(str(x) for x in xs),
        "matches": _m_matches,
        # casts (Double/Long/Conversion in io/eval/)
        "double": lambda x: np.asarray(x, dtype=np.float64) if np.ndim(x) else float(x),
        "long": lambda x: np.asarray(x, dtype=np.float64).astype(np.int64).astype(np.float64)
        if np.ndim(x)
        else float(int(x)),
        "isNull": lambda x: float(x is None or (np.ndim(x) == 0 and isinstance(x, float) and math.isnan(x))),
        "notNull": lambda x: float(not (x is None or (np.ndim(x) == 0 and isinstance(x, float) and math.isnan(x)))),
        "dateTime": _m_date_time,
        # distributions
        "betaDistribution": _d_beta,
        "gammaDistribution": _d_gamma,
        "geometricDistribution": _d_geometric,
        "logNormalDistribution": _d_lognormal,
        "weibullDistribution": _d_weibull,
        "markovChain": _d_markov,
        "density": _density_all,
        "cumulativeProbability": _cum_all,
        "probability": _prob_all,
        "sample": _sample_all,
        # fitting / smoothing
        "loess": _m_loess,
        "gaussfit": _m_gaussfit,
        "harmfit": _m_harmfit,
        "harmonicFit": _m_harmfit,
        "akima": _m_akima,
        "predict": _predict_all,
        # clustering
        "dbscan": _m_dbscan,
        "fuzzyKmeans": _m_fuzzy_kmeans,
        "multiKmeans": _m_multi_kmeans,
        "getCluster": _m_get_cluster,
        "getMembershipMatrix": _m_get_membership,
        # computational geometry
        "convexHull": _m_convex_hull,
        "getVertices": _m_get_vertices,
        "getArea": _m_get_area,
        "getBoundarySize": _m_get_boundary_size,
        "getBaryCenter": _m_get_bary_center,
        "enclosingDisk": _m_enclosing_disk,
        "getCenter": lambda m: _disk_only(m, "getCenter")["center"],
        "getRadius": lambda m: _disk_only(m, "getRadius")["radius"],
        "getSupportPoints": lambda m: _disk_only(m, "getSupportPoints")["support"],
    }
)


# -- second tranche: labeled matrices, signal accessors, misc (io/eval/) ------


class _ParamArray(np.ndarray):
    """ndarray subclass carrying evaluator metadata (oscillate params,
    matrix row/column labels) — the reference's VectorFunction / labeled
    Matrix objects flattened onto numpy."""

    def __new__(cls, arr, **meta):
        obj = np.asarray(arr, dtype=np.float64).view(cls)
        obj.meta = dict(meta)
        return obj

    def __array_finalize__(self, obj):
        if obj is not None:
            self.meta = dict(getattr(obj, "meta", {}))


def _osc2(amp, omega, phase, n=128):
    """OscillateEvaluator: sampled sine wave carrying its parameters for
    getAmplitude()/getAngularFrequency()/getPhase()."""
    t = np.arange(int(n), dtype=np.float64)
    wave = float(amp) * np.sin(float(omega) * t + float(phase))
    return _ParamArray(wave, amplitude=float(amp), angularFrequency=float(omega), phase=float(phase))


def _osc_meta(x, key):
    meta = getattr(x, "meta", None)
    if not meta or key not in meta:
        raise MathExprError(f"get{key[0].upper()+key[1:]}() expects an oscillate() wave")
    return meta[key]


def _m_set_col_labels(m, labels):
    out = _ParamArray(_as_matrix(m, "setColumnLabels"), **getattr(m, "meta", {}))
    out.meta["colLabels"] = [str(x) for x in labels]
    return out


def _m_set_row_labels(m, labels):
    out = _ParamArray(_as_matrix(m, "setRowLabels"), **getattr(m, "meta", {}))
    out.meta["rowLabels"] = [str(x) for x in labels]
    return out


def _m_get_labels(m, key):
    meta = getattr(m, "meta", None)
    if not meta or key not in meta:
        raise MathExprError("matrix has no labels — set them with setColumnLabels()/setRowLabels()")
    return meta[key]


def _m_get_attribute(x, key):
    meta = getattr(x, "meta", None) or (x if isinstance(x, dict) else None)
    if not meta or str(key) not in meta:
        raise MathExprError(f"getAttribute: no attribute {key!r}")
    return meta[str(key)]


def _m_get_attributes(x):
    meta = getattr(x, "meta", None) or (x if isinstance(x, dict) else None)
    if meta is None:
        raise MathExprError("getAttributes expects an attributed object")
    return {k: v for k, v in meta.items()}


def _m_knn2(m, q, k):
    """KnnEvaluator: the k rows of the matrix nearest (euclidean) to the
    query vector, nearest first."""
    X = _as_matrix(m, "knn")
    qv = _vec(q, "knn")
    d = np.linalg.norm(X - qv[None, :], axis=1)
    idx = np.argsort(d, kind="stable")[: int(k)]
    return X[idx]


_CONV_METERS = {
    "inches": 0.0254, "feet": 0.3048, "yards": 0.9144, "miles": 1609.344,
    "millimeters": 0.001, "centimeters": 0.01, "meters": 1.0, "kilometers": 1000.0,
}


def _m_convert(frm, to, value):
    """ConversionEvaluator: length-unit conversion."""
    f, t = str(frm), str(to)
    if f not in _CONV_METERS or t not in _CONV_METERS:
        raise MathExprError(f"convert: units must be one of {sorted(_CONV_METERS)}")
    return float(value) * _CONV_METERS[f] / _CONV_METERS[t]


def _m_project_to_border(model, m):
    """ProjectToBorderEvaluator: project 2-D points radially onto the
    enclosingDisk() border."""
    d = _disk_only(model, "projectToBorder")
    P = _as_matrix(m, "projectToBorder")
    c, r = np.asarray(d["center"]), float(d["radius"])
    out = np.empty_like(P)
    for i, p in enumerate(P):
        v = p - c
        nrm = np.linalg.norm(v)
        out[i] = c + (v / nrm) * r if nrm > 1e-12 else c + np.array([r, 0.0])
    return out


def _m_bicubic(xg, yg, grid):
    """BicubicSplineEvaluator: Catmull-Rom bicubic over a regular grid;
    predict(model, x, y) interpolates."""
    x = _vec(xg, "bicubicSpline")
    y = _vec(yg, "bicubicSpline")
    Z = _as_matrix(grid, "bicubicSpline")
    if Z.shape != (len(x), len(y)):
        raise MathExprError("bicubicSpline: grid must be len(x) x len(y)")
    if len(x) < 4 or len(y) < 4:
        raise MathExprError("bicubicSpline needs a 4x4+ grid")
    return {"type": "bicubic", "x": np.sort(x), "y": np.sort(y), "z": Z}


def _catmull_1d(p, t):
    return (
        0.5
        * (
            (2 * p[1])
            + (-p[0] + p[2]) * t
            + (2 * p[0] - 5 * p[1] + 4 * p[2] - p[3]) * t * t
            + (-p[0] + 3 * p[1] - 3 * p[2] + p[3]) * t**3
        )
    )


def _bicubic_eval(model, xq, yq):
    x, y, Z = model["x"], model["y"], model["z"]

    def axis_cell(grid, v):
        i = int(np.clip(np.searchsorted(grid, v, side="right") - 1, 0, len(grid) - 2))
        t = (v - grid[i]) / (grid[i + 1] - grid[i])
        idx = np.clip([i - 1, i, i + 1, i + 2], 0, len(grid) - 1)
        return idx, t

    xi, tx = axis_cell(x, float(xq))
    yi, ty = axis_cell(y, float(yq))
    cols = np.array([_catmull_1d(Z[xi, j], tx) for j in yi])
    return float(_catmull_1d(cols, ty))


_base_predict2 = EVALS["predict"]


def _predict_any(model, *xs):
    if isinstance(model, dict) and model.get("type") == "bicubic":
        if len(xs) != 2:
            raise MathExprError("predict(bicubicModel, x, y) expects two coordinates")
        return _bicubic_eval(model, xs[0], xs[1])
    if len(xs) != 1:
        raise MathExprError("predict(model, x) expects one operand")
    return _base_predict2(model, xs[0])


EVALS.update(
    {
        "oscillate": _osc2,
        "getAmplitude": lambda x: _osc_meta(x, "amplitude"),
        "getAngularFrequency": lambda x: _osc_meta(x, "angularFrequency"),
        "getPhase": lambda x: _osc_meta(x, "phase"),
        "setColumnLabels": _m_set_col_labels,
        "setRowLabels": _m_set_row_labels,
        "getColumnLabels": lambda m: _m_get_labels(m, "colLabels"),
        "getRowLabels": lambda m: _m_get_labels(m, "rowLabels"),
        "getAttribute": _m_get_attribute,
        "getAttributes": _m_get_attributes,
        "knn": _m_knn2,
        "convert": _m_convert,
        "projectToBorder": _m_project_to_border,
        "bicubicSpline": _m_bicubic,
        "predict": _predict_any,
    }
)


# -- caches / cell (Lang.java putCache/getCache/listCache/removeCache, cell) --
#
# Reference: io/eval/PutCacheEvaluator.java, GetCacheEvaluator.java,
# ListCacheEvaluator.java, RemoveCacheEvaluator.java store objects in the
# /stream handler's ConcurrentHashMap-of-spaces ("objectCache"); cell()
# (CellStream.java) wraps a value into a single named tuple. Here the cache
# is a driver-process module global — same single-JVM visibility the
# reference gives one Solr node.

_OBJECT_CACHE: dict = {}


def _cache_put(space, key, value):
    _OBJECT_CACHE.setdefault(str(space), {})[str(key)] = value
    return value


def _cache_get(space, key):
    try:
        return _OBJECT_CACHE[str(space)][str(key)]
    except KeyError:
        raise MathExprError(f"getCache: no entry {space!r}/{key!r}") from None


def _cache_remove(space, key):
    try:
        return _OBJECT_CACHE.get(str(space), {}).pop(str(key))
    except KeyError:
        raise MathExprError(f"removeCache: no entry {space!r}/{key!r}") from None


def _cache_list(space=None):
    if space is None:
        return sorted(_OBJECT_CACHE)
    return sorted(_OBJECT_CACHE.get(str(space), {}))


EVALS.update(
    {
        "putCache": _cache_put,
        "getCache": _cache_get,
        "removeCache": _cache_remove,
        "listCache": _cache_list,
        # CellStream: one named tuple holding the evaluated value
        "cell": lambda name, value: {str(name): value},
    }
)
_LITERAL_STR_FNS.update({"putCache", "getCache", "removeCache", "listCache", "cell"})


# -- tuple-list evaluators (Lang.java val/pivot/latlonVectors/termVectors) --
#
# Reference: io/eval/RawValueEvaluator.java (val), PivotEvaluator.java
# (pivot: tuple list -> labeled matrix), LatLonVectorsEvaluator.java
# (field="lat,lon" strings -> n x 2 matrix), TermVectorsEvaluator.java
# (docs with a terms list -> sqrt(tf) * (log((n+1)/(df+1)) + 1) TF-IDF
# matrix with doc-frequency pruning). Tuple lists come from let()-bound
# streams — streamexpr binds each stream variable as a lazy collector
# (object-store blocks until an evaluator needs rows, LET_VECTOR_MAX cap).


def _tuples(x, who: str):
    if hasattr(x, "_as_tuples"):
        x = x._as_tuples()
    if not isinstance(x, list) or (x and not isinstance(x[0], dict)):
        raise MathExprError(f"{who} expects a list of tuples (a let()-bound stream)")
    if not x:
        raise MathExprError(f"{who}: empty tuple list")
    return x


def _pivot(tuples, x, y, v):
    tuples = _tuples(tuples, "pivot")
    xs = sorted({str(t[x]) for t in tuples})  # reference uses TreeSet order
    ys = sorted({str(t[y]) for t in tuples})
    xi = {k: i for i, k in enumerate(xs)}
    yi = {k: i for i, k in enumerate(ys)}
    data = np.zeros((len(xs), len(ys)), dtype=np.float64)
    for t in tuples:
        data[xi[str(t[x])], yi[str(t[y])]] = float(t[v])
    return _ParamArray(data, rowLabels=xs, colLabels=ys)


def _latlon_vectors(tuples, field: str):
    tuples = _tuples(tuples, "latlonVectors")
    out = np.empty((len(tuples), 2), dtype=np.float64)
    row_labels = []
    for i, t in enumerate(tuples):
        raw = str(t[field])
        parts = raw.split(",") if "," in raw else raw.split(" ")
        out[i, 0] = float(parts[0].strip())
        out[i, 1] = float(parts[1].strip())
        if t.get("id") is not None:
            row_labels.append(str(t["id"]))
    return _ParamArray(out, rowLabels=row_labels, colLabels=["lat", "lon"])


def _term_vectors(tuples, min_term_length=3, min_doc_freq=0.05, max_doc_freq=0.5, excludes=()):
    tuples = _tuples(tuples, "termVectors")
    min_len = int(min_term_length)
    doc_freqs: dict = {}
    row_labels = []
    doc_term_lists = []
    for t in tuples:
        terms = t.get("terms")
        if terms is None:
            raise MathExprError("termVectors: document tuples must contain a 'terms' field")
        terms = list(terms)
        row_labels.append(str(t.get("id")))
        kept = [
            w
            for w in terms
            if len(w) >= min_len and not any(e in w for e in excludes)
        ]
        doc_term_lists.append(kept)
        for w in set(kept):
            doc_freqs[w] = doc_freqs.get(w, 0) + 1
    n = len(tuples)
    lo, hi = int(n * float(min_doc_freq)), int(n * float(max_doc_freq))
    feats = sorted(w for w, df in doc_freqs.items() if lo <= df <= hi)
    fi = {w: i for i, w in enumerate(feats)}
    dfv = np.array([doc_freqs[w] for w in feats], dtype=np.float64)
    idf = np.log((n + 1) / (dfv + 1)) + 1.0
    mat = np.zeros((n, len(feats)), dtype=np.float64)
    for d, kept in enumerate(doc_term_lists):
        for w in kept:
            j = fi.get(w)
            if j is not None:
                mat[d, j] += 1.0
    mat = np.sqrt(mat) * idf
    return _ParamArray(
        mat,
        rowLabels=row_labels,
        colLabels=feats,
        docFreqs={w: int(doc_freqs[w]) for w in feats},
    )


EVALS.update(
    {
        "val": lambda x: x,  # RawValueEvaluator: the literal itself
        "pivot": _pivot,
        "latlonVectors": _latlon_vectors,
        "termVectors": _term_vectors,
    }
)
_LITERAL_STR_FNS.update({"val", "pivot"})
