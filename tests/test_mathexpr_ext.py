"""Unit tests for the round-5 mathexpr expansion (~150 evaluators).

No Ray needed — everything here is driver-side numpy. The special-function
tests validate the continued-fraction/series implementations against EXACT
closed forms computable with stdlib integer math (binomial sums for the
incomplete beta, Poisson sums for the incomplete gamma, the df=1/df=2
Student-t closed forms), not against memorized constants.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

import apache___solr_ray.mathexpr as mx


# ---------------------------------------------------------------------------
# special functions vs exact closed forms
# ---------------------------------------------------------------------------


def test_betainc_matches_exact_binomial_sum():
    # I_p(a, n-a+1) = P(Binomial(n,p) >= a)  — exact via math.comb
    for n, a, p in [(10, 3, 0.4), (25, 10, 0.5), (50, 1, 0.02), (17, 17, 0.9)]:
        exact = sum(
            math.comb(n, k) * p**k * (1 - p) ** (n - k) for k in range(a, n + 1)
        )
        assert mx.betainc(a, n - a + 1, p) == pytest.approx(exact, abs=1e-12)


def test_gammainc_matches_exact_poisson_sum():
    # P(s, x) with integer s:  P(s,x) = 1 - sum_{j<s} x^j e^-x / j!
    for s, x in [(1, 0.5), (3, 2.0), (7, 10.0), (12, 4.0)]:
        exact = 1.0 - sum(x**j * math.exp(-x) / math.factorial(j) for j in range(s))
        assert mx.gammainc_p(float(s), x) == pytest.approx(exact, abs=1e-12)


def test_t_cdf_integer_df_closed_forms():
    for t in [-3.0, -0.7, 0.0, 0.4, 2.5]:
        assert mx.t_cdf(t, 1) == pytest.approx(0.5 + math.atan(t) / math.pi, abs=1e-12)
        assert mx.t_cdf(t, 2) == pytest.approx(
            0.5 + t / (2.0 * math.sqrt(2.0 + t * t)), abs=1e-12
        )


def test_f_cdf_consistent_with_t():
    # X ~ t(d)  =>  X^2 ~ F(1, d):  F_cdf(t^2; 1, d) = 2*T_cdf(|t|; d) - 1
    for t, d in [(1.3, 5), (0.6, 11), (2.2, 30)]:
        assert mx.f_cdf(t * t, 1, d) == pytest.approx(2 * mx.t_cdf(t, d) - 1, abs=1e-10)


def test_chi2_cdf_even_df_closed_form():
    for x, k in [(3.0, 2), (7.5, 6), (1.2, 4)]:
        m = k // 2
        exact = 1.0 - math.exp(-x / 2) * sum((x / 2) ** j / math.factorial(j) for j in range(m))
        assert mx.chi2_cdf(x, k) == pytest.approx(exact, abs=1e-12)


def test_norm_cdf_basics():
    assert mx.norm_cdf(0.0) == pytest.approx(0.5)
    assert mx.norm_cdf(1.3) + mx.norm_cdf(-1.3) == pytest.approx(1.0, abs=1e-14)
    assert mx.norm_cdf(5.0, mean=5.0, sd=2.0) == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# statistics II
# ---------------------------------------------------------------------------


def test_rank_fractional_ties():
    assert mx.EVALS["rank"]([3, 1, 2, 2]).tolist() == [4.0, 1.0, 2.5, 2.5]
    assert mx.EVALS["rank"]([5, 5, 5]).tolist() == [2.0, 2.0, 2.0]


def test_mann_whitney_u_matches_brute_pair_count():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 20, 30).astype(float)
    b = rng.integers(5, 25, 40).astype(float)
    res = mx._mann_whitney(a, b)
    brute_u1 = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    assert res["u1"] == pytest.approx(brute_u1)
    assert res["u"] == pytest.approx(min(brute_u1, len(a) * len(b) - brute_u1))
    assert 0.0 <= res["p"] <= 1.0


def test_ks_d_matches_brute():
    rng = np.random.default_rng(11)
    a, b = rng.normal(0, 1, 50), rng.normal(0.5, 1, 60)
    res = mx._ks(a, b)
    pts = np.concatenate([a, b])
    brute = max(
        abs((a <= t).mean() - (b <= t).mean()) for t in pts
    )
    assert res["d"] == pytest.approx(brute, abs=1e-12)


def test_anova_known_case():
    # groups shifted by constant offsets: hand-computable F
    g1, g2, g3 = np.r_[1.0, 2, 3], np.r_[2.0, 3, 4], np.r_[5.0, 6, 7]
    res = mx._anova(g1, g2, g3)
    assert res["f"] == pytest.approx(13.0)
    assert res["p"] == pytest.approx(1.0 - mx.f_cdf(13.0, 2, 6), abs=1e-12)


def test_paired_ttest_against_closed_form():
    a = np.r_[4.0, 5, 6, 7, 9]
    b = np.r_[3.5, 5.5, 5, 6, 8]
    res = mx._paired_ttest(a, b)
    d = a - b
    t = d.mean() / (d.std(ddof=1) / math.sqrt(len(d)))
    assert res["t"] == pytest.approx(t)
    assert res["df"] == 4.0
    assert res["p"] == pytest.approx(2 * (1 - mx.t_cdf(abs(t), 4)), abs=1e-12)


def test_chisq_dataset_equal_sets_zero():
    a = np.r_[10.0, 20, 30]
    res = mx._chisq_dataset(a, a)
    assert res["chisq"] == pytest.approx(0.0)
    assert res["p"] == pytest.approx(1.0)


def test_means_mode_freqtable():
    v = [1.0, 2.0, 4.0, 8.0]
    assert mx.EVALS["geometricMean"](v) == pytest.approx((1 * 2 * 4 * 8) ** 0.25)
    assert mx.EVALS["harmonicMean"](v) == pytest.approx(4 / (1 + 0.5 + 0.25 + 0.125))
    assert mx.EVALS["mode"]([1, 2, 2, 3, 3]) == 2.0  # smallest among tied modes
    ft = mx.EVALS["freqTable"]([1, 1, 2])
    assert ft == [
        {"value": 1.0, "count": 2.0, "pct": pytest.approx(2 / 3)},
        {"value": 2.0, "count": 1.0, "pct": pytest.approx(1 / 3)},
    ]
    assert mx.EVALS["sumSq"]([3, 4]) == 25.0
    assert mx.EVALS["median"]([1, 3, 2]) == 2.0


# ---------------------------------------------------------------------------
# vectors / norms / distances / matrices
# ---------------------------------------------------------------------------


def test_vector_utilities():
    assert mx.EVALS["copyOf"]([1, 2, 3], 5).tolist() == [1, 2, 3, 0, 0]
    assert mx.EVALS["copyOf"]([1, 2, 3], 2).tolist() == [1, 2]
    assert mx.EVALS["copyOfRange"]([1, 2, 3, 4], 1, 3).tolist() == [2, 3]
    assert mx.EVALS["valueAt"]([5, 6, 7], 1) == 6.0
    assert mx.EVALS["zeros"](3).tolist() == [0, 0, 0]
    assert mx.EVALS["ones"](2).tolist() == [1, 1]
    assert mx.EVALS["natural"](4).tolist() == [0, 1, 2, 3]
    assert mx.EVALS["primes"](5, 0).tolist() == [2, 3, 5, 7, 11]
    assert mx.EVALS["primes"](3, 10).tolist() == [11, 13, 17]
    assert mx.EVALS["asc"]([3, 1, 2]).tolist() == [1, 2, 3]
    ps = mx.EVALS["pairSort"]([3, 1, 2], [30, 10, 20])
    assert ps.tolist() == [[1, 2, 3], [10, 20, 30]]


def test_norms_scaling():
    assert mx.EVALS["l1norm"]([3, -4]) == 7.0
    assert mx.EVALS["norm"]([3, 4]) == 5.0
    assert mx.EVALS["linfnorm"]([3, -9, 4]) == 9.0
    assert mx.EVALS["normalizeSum"]([2, 2, 4]).tolist() == [0.25, 0.25, 0.5]
    assert mx.EVALS["minMaxScale"]([2, 4, 6]).tolist() == [0.0, 0.5, 1.0]
    assert mx.EVALS["minMaxScale"]([2, 4, 6], 10, 20).tolist() == [10.0, 15.0, 20.0]


def test_distances():
    assert mx.EVALS["manhattan"]([1, 2], [4, 6]) == 7.0
    assert mx.EVALS["chebyshev"]([1, 2], [4, 6]) == 4.0
    assert mx.EVALS["canberra"]([1, 3], [2, 3]) == pytest.approx(1 / 3)
    # EMD between two 1-d histograms: move 1 unit of mass one bin over
    assert mx.EVALS["earthMovers"]([1, 0], [0, 1]) == 1.0
    dm = mx.EVALS["distance"](np.array([[0.0, 0], [3, 4]]))
    assert dm[0, 1] == pytest.approx(5.0)
    assert dm[1, 0] == pytest.approx(5.0)
    assert dm[0, 0] == pytest.approx(0.0)


def test_matrix_ops():
    m = mx.EVALS["matrix"]([1, 2], [3, 4])
    assert m.tolist() == [[1, 2], [3, 4]]
    assert mx.EVALS["transpose"](m).tolist() == [[1, 3], [2, 4]]
    assert mx.EVALS["rowAt"](m, 1).tolist() == [3, 4]
    assert mx.EVALS["columnAt"](m, 0).tolist() == [1, 3]
    assert mx.EVALS["rowCount"](m) == 2.0
    assert mx.EVALS["columnCount"](m) == 2.0
    assert mx.EVALS["matrixMult"](m, m).tolist() == [[7, 10], [15, 22]]
    assert mx.EVALS["sumRows"](m).tolist() == [3, 7]
    assert mx.EVALS["sumColumns"](m).tolist() == [4, 6]
    assert mx.EVALS["grandSum"](m) == 10.0
    assert mx.EVALS["scalarAdd"](10, m).tolist() == [[11, 12], [13, 14]]
    assert mx.EVALS["scalarMultiply"](2, m).tolist() == [[2, 4], [6, 8]]


def test_corr_cov_matrix_forms():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 3))
    cm = mx.EVALS["corr"](X)
    assert cm == pytest.approx(np.corrcoef(X, rowvar=False))
    vm = mx.EVALS["cov"](X)
    assert vm == pytest.approx(np.cov(X, rowvar=False, ddof=1))
    # two-vector forms still work
    assert mx.EVALS["corr"](X[:, 0], X[:, 1]) == pytest.approx(
        np.corrcoef(X[:, 0], X[:, 1])[0, 1]
    )


# ---------------------------------------------------------------------------
# signal / series / interpolation
# ---------------------------------------------------------------------------


def test_exp_moving_avg():
    out = mx.EVALS["expMovingAvg"]([10.0, 20.0, 30.0], 3)  # alpha = 0.5
    assert out.tolist() == [10.0, 15.0, 22.5]


def test_moving_mad_brute():
    rng = np.random.default_rng(5)
    v = rng.normal(size=30)
    w = 7
    out = mx.EVALS["movingMAD"](v, w)
    for i in range(len(v) - w + 1):
        win = v[i : i + w]
        assert out[i] == pytest.approx(np.median(np.abs(win - np.median(win))))


def test_lerp_spline_predict_and_knots():
    xs, ys = [0.0, 1, 2, 3, 4], [0.0, 1, 4, 9, 16]
    lm = mx.EVALS["lerp"](xs, ys)
    assert mx.EVALS["predict"](lm, 1.5) == pytest.approx(2.5)
    sm = mx.EVALS["spline"](xs, ys)
    # spline interpolates the knots exactly
    assert mx.EVALS["predict"](sm, np.array(xs)) == pytest.approx(ys, abs=1e-9)
    # derivative of the lerp between x=1 and x=2 is the segment slope 3
    dm = mx.EVALS["derivative"](lm)
    assert mx.EVALS["predict"](dm, 1.5) == pytest.approx(3.0, abs=1e-3)


def test_integrate():
    lm = mx.EVALS["lerp"]([0.0, 1, 2], [0.0, 2, 4])  # y = 2x
    assert mx.EVALS["integrate"](lm, 0, 2) == pytest.approx(4.0)
    sm = mx.EVALS["spline"]([0.0, 1, 2, 3, 4], [0.0, 1, 4, 9, 16])
    dense = np.linspace(0, 4, 4001)
    expect = np.trapz(mx._spline_eval(sm, dense), dense)
    assert mx.EVALS["integrate"](sm, 0, 4) == pytest.approx(expect, rel=1e-6)


def test_polyfit_exact_on_polynomial():
    x = np.arange(8, dtype=float)
    y = 2 * x**2 - 3 * x + 1
    assert mx.EVALS["polyfit"](y, 2) == pytest.approx(y, abs=1e-8)


def test_conv_and_finddelay():
    assert mx.EVALS["conv"]([1, 2], [1, 1, 1]).tolist() == [1, 3, 3, 2]
    base = np.r_[0.0, 0, 1, 2, 3, 0, 0, 0]
    shifted = np.r_[0.0, 0, 0, 0, 1, 2, 3, 0]  # b lags a by 2
    assert mx.EVALS["finddelay"](shifted, base) == 2.0


def test_fft_ifft_roundtrip_parseval():
    rng = np.random.default_rng(9)
    v = rng.normal(size=16)
    F = mx.EVALS["fft"](v)
    assert F.shape == (2, 16)
    back = mx.EVALS["ifft"](F)
    assert back == pytest.approx(v, abs=1e-10)
    assert (F[0] ** 2 + F[1] ** 2).sum() == pytest.approx(16 * (v**2).sum())


def test_oscillate():
    w = mx.EVALS["oscillate"](2.0, 0.5, 0.0, 8)
    assert w == pytest.approx(2.0 * np.sin(0.5 * np.arange(8)))


# ---------------------------------------------------------------------------
# boolean / conditional / scalar math
# ---------------------------------------------------------------------------


def test_boolean_and_conditionals():
    E = mx.EVALS
    assert E["and"](1, 1, 0) == 0.0 and E["and"](1, 2) == 1.0
    assert E["or"](0, 0) == 0.0 and E["or"](0, 3) == 1.0
    assert E["not"](0) == 1.0 and E["eor"](1, 0) == 1.0
    assert E["eq"](2, 2) == 1.0 and E["gt"](3, 2) == 1.0 and E["lte"](2, 2) == 1.0
    assert E["if"](1, 5, 7) == 5 and E["if"](0, 5, 7) == 7
    assert E["if"]([1, 0], [5, 5], [7, 7]).tolist() == [5.0, 7.0]
    assert E["gt"]([1, 5], [2, 2]).tolist() == [0.0, 1.0]


def test_scalar_math():
    E = mx.EVALS
    assert E["cbrt"](27) == pytest.approx(3.0)
    assert E["mod"](7, 3) == 1.0
    assert E["recip"](4.0) == 0.25
    assert E["factorial"](5) == 120.0
    assert E["binomialCoefficient"](5, 2) == 10.0
    assert E["sin"](0) == 0.0 and E["cos"](0) == 1.0
    assert E["tanh"](0) == 0.0 and E["atan"](1) == pytest.approx(math.pi / 4)


# ---------------------------------------------------------------------------
# distributions
# ---------------------------------------------------------------------------


def test_binomial_poisson_cdf_vs_exact_sums():
    b = mx.EVALS["binomialDistribution"](12, 0.3)
    for k in [0, 3, 7, 12]:
        exact = sum(math.comb(12, j) * 0.3**j * 0.7 ** (12 - j) for j in range(k + 1))
        assert mx.EVALS["cumulativeProbability"](b, k) == pytest.approx(exact, abs=1e-12)
        assert mx.EVALS["probability"](b, k) == pytest.approx(
            math.comb(12, k) * 0.3**k * 0.7 ** (12 - k), abs=1e-12
        )
    p = mx.EVALS["poissonDistribution"](2.5)
    for k in [0, 2, 6]:
        exact = sum(2.5**j * math.exp(-2.5) / math.factorial(j) for j in range(k + 1))
        assert mx.EVALS["cumulativeProbability"](p, k) == pytest.approx(exact, abs=1e-12)


def test_continuous_distributions():
    E = mx.EVALS
    nd = E["normalDistribution"](10, 2)
    assert E["cumulativeProbability"](nd, 10) == pytest.approx(0.5)
    assert E["probability"](nd, 8, 12) == pytest.approx(
        mx.norm_cdf(1.0) - mx.norm_cdf(-1.0)
    )
    assert E["density"](nd, 10) == pytest.approx(1 / (2 * math.sqrt(2 * math.pi)))
    ud = E["uniformDistribution"](0, 4)
    assert E["cumulativeProbability"](ud, 1) == 0.25
    assert E["density"](ud, 2) == 0.25
    td = E["triangularDistribution"](0, 1, 3)
    assert E["cumulativeProbability"](td, 0) == 0.0
    assert E["cumulativeProbability"](td, 3) == 1.0
    assert E["cumulativeProbability"](td, 1) == pytest.approx(1 / 3)
    ed = E["empiricalDistribution"]([1, 2, 3, 4])
    assert E["cumulativeProbability"](ed, 2.5) == 0.5
    en = E["enumeratedDistribution"]([1, 1, 2])
    assert E["probability"](en, 1) == pytest.approx(2 / 3)
    zf = E["zipFDistribution"](3, 1.0)
    assert E["probability"](zf, 1) == pytest.approx((1 / 1) / (1 + 0.5 + 1 / 3))


def test_sample_deterministic_and_sane():
    E = mx.EVALS
    nd = E["normalDistribution"](5, 1)
    s1, s2 = E["sample"](nd, 4000), E["sample"](nd, 4000)
    assert s1.tolist() == s2.tolist()  # fixed seed => reproducible
    assert s1.mean() == pytest.approx(5.0, abs=0.1)
    ui = E["uniformIntegerDistribution"](1, 6)
    s = E["sample"](ui, 1000)
    assert set(np.unique(s)) <= {1.0, 2.0, 3.0, 4.0, 5.0, 6.0}


# ---------------------------------------------------------------------------
# regression / ML models + getValue
# ---------------------------------------------------------------------------


def test_ols_regress_recovers_exact_plane():
    rng = np.random.default_rng(21)
    X = rng.normal(size=(50, 2))
    y = 3.0 + 2.0 * X[:, 0] - 0.5 * X[:, 1]
    m = mx.EVALS["olsRegress"](X, y)
    assert m["intercept"] == pytest.approx(3.0, abs=1e-9)
    assert m["coeffs"] == pytest.approx([2.0, -0.5], abs=1e-9)
    assert m["rsquared"] == pytest.approx(1.0)
    assert mx.EVALS["predict"](m, np.array([1.0, 2.0])) == pytest.approx(4.0)
    assert mx.EVALS["predict"](m, X) == pytest.approx(y)


def test_knn_regress():
    m = mx.EVALS["knnRegress"]([0.0, 1, 2, 10], [0.0, 10, 20, 100], 2)
    # nearest to 0.4 are x=0,1 -> mean(0,10) = 5
    assert mx.EVALS["predict"](m, 0.4) == 5.0


def test_kmeans_two_obvious_clusters():
    X = np.vstack(
        [np.random.default_rng(1).normal(0, 0.1, (20, 2)),
         np.random.default_rng(2).normal(10, 0.1, (20, 2))]
    )
    m = mx.EVALS["kmeans"](X, 2)
    cents = mx.EVALS["getCentroids"](m)
    assert sorted(round(c) for c in cents[:, 0]) == [0, 10]
    labels = mx.EVALS["getValue"](m, "labels")
    assert len(set(labels[:20])) == 1 and len(set(labels[20:])) == 1
    assert labels[0] != labels[-1]


def test_getvalue_and_literal_string_args():
    from apache___solr_ray.streamexpr import parse_stream_expr

    node = parse_stream_expr('getValue(m, "f")')
    out = mx.eval_node(node, {"m": {"f": 13.0, "p": 0.01}}, None)
    assert out == 13.0
    # unresolved words still raise outside the whitelist
    node2 = parse_stream_expr("mean(nosuchvar)")
    with pytest.raises(mx.MathExprError):
        mx.eval_node(node2, {}, None)


def test_result_to_table_matrix_and_model_guard():
    t = mx.result_to_table(np.array([[1.0, 2.0], [3.0, 4.0]]))
    assert t.column_names == ["i", "j", "value"]
    assert t.column("value").to_pylist() == [1.0, 2.0, 3.0, 4.0]
    assert t.column("i").to_pylist() == [0, 0, 1, 1]
    with pytest.raises(mx.MathExprError):
        mx.result_to_table({"type": "lerp", "x": np.r_[1.0], "y": np.r_[1.0]})


def test_precision_on_nested():
    out = mx.EVALS["precision"]({"a": 1.23456, "b": 2.0}, 2)
    assert out == {"a": 1.23, "b": 2.0}


# --- round-5 wave: the Lang.java name-gap tranche ---------------------------


def test_string_cast_and_vector_utilities():
    E = mx.EVALS
    assert E["upper"]("abc") == "ABC" and E["lower"]("ABC") == "abc"
    assert E["trim"]("  x ") == "x"
    assert E["split"]("a,b,c", ",") == ["a", "b", "c"]
    assert E["concat"]("a", 1, "b") == "a1b"
    assert E["matches"]("hello", "l+o") == 1.0
    assert E["matches"]("hello", "^z") == 0.0
    assert E["indexOf"]([5, 7, 9], 9) == 2.0
    assert E["indexOf"]([5, 7, 9], 4) == -1.0
    assert list(E["ltrim"]([1, 2, 3, 4], 2)) == [3.0, 4.0]
    assert list(E["rtrim"]([1, 2, 3, 4], 1)) == [1.0, 2.0, 3.0]
    assert list(E["repeat"](7, 3)) == [7.0, 7.0, 7.0]
    assert list(E["addAll"]([1, 2], [3], [4])) == [1.0, 2.0, 3.0, 4.0]
    assert E["var"]([1, 2, 3, 4]) == pytest.approx(5.0 / 3.0)
    assert E["trunc"](-2.7) == -2.0
    assert E["long"](3.9) == 3.0
    assert E["coalesce"](None, float("nan"), 5.0) == 5.0
    assert E["isNull"](None) == 1.0 and E["notNull"](3.0) == 1.0
    assert E["uuid"]("seed") == E["uuid"]("seed")
    assert E["dateTime"](0, "yyyy-MM-dd") == "1970-01-01"
    assert E["gteq"](3, 3) == 1.0 and E["lteq"](4, 3) == 0.0


def test_new_distributions_reference_values():
    E = mx.EVALS
    # values cross-checked against scipy.stats closed forms
    assert E["cumulativeProbability"](E["betaDistribution"](2, 5), 0.3) == pytest.approx(0.579825, abs=1e-6)
    assert E["cumulativeProbability"](E["gammaDistribution"](2.0, 3.0), 6.0) == pytest.approx(
        1 - np.exp(-2) * 3, abs=1e-9
    )
    assert E["cumulativeProbability"](E["weibullDistribution"](1.5, 1.0), 1.0) == pytest.approx(
        1 - np.exp(-1), abs=1e-9
    )
    assert E["probability"](E["geometricDistribution"](0.3), 2) == pytest.approx(0.3 * 0.49)
    ln = E["logNormalDistribution"](0.0, 1.0)
    assert E["cumulativeProbability"](ln, 1.0) == pytest.approx(0.5, abs=1e-9)
    # density integrates to ~cdf increments
    d = E["betaDistribution"](2, 2)
    xs = np.linspace(0.01, 0.99, 99)
    riemann = np.sum([E["density"](d, x) for x in xs]) * (xs[1] - xs[0])
    assert riemann == pytest.approx(E["cumulativeProbability"](d, 0.99) - E["cumulativeProbability"](d, 0.01), abs=1e-3)
    # seeded sampling is deterministic and the base dists still work
    assert list(E["sample"](E["gammaDistribution"](2, 3), 3)) == list(E["sample"](E["gammaDistribution"](2, 3), 3))
    assert E["cumulativeProbability"](E["normalDistribution"](0, 1), 1.0) == pytest.approx(0.841345, abs=1e-6)


def test_fitting_and_interpolation():
    E = mx.EVALS
    x = np.arange(20.0)
    y = 3 * np.exp(-((x - 8.0) ** 2) / 10)
    fit = E["gaussfit"](x, y)
    assert np.allclose(fit, y, atol=1e-8)  # exact gaussian recovered
    a = E["akima"](np.arange(10.0), np.arange(10.0) ** 2)
    assert E["predict"](a, 4.5) == pytest.approx(20.25, abs=0.05)
    t = np.arange(40.0)
    wave = 2.0 + 1.5 * np.sin(0.6 * t + 0.4)
    assert np.allclose(E["harmfit"](t, wave), wave, atol=0.15)
    sm = E["loess"](np.r_[1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    assert np.allclose(sm, np.arange(1.0, 11.0), atol=0.2)  # linear data unchanged


def test_clustering_and_geometry():
    E = mx.EVALS
    rng = np.random.default_rng(7)
    X = np.vstack([rng.normal(0, 0.1, (6, 2)), rng.normal(5, 0.1, (6, 2))])
    db = E["dbscan"](X, 1.0, 3)
    labs = np.asarray(db["labels"])
    assert len(set(labs[:6])) == 1 and len(set(labs[6:])) == 1 and labs[0] != labs[6]
    assert list(E["getCluster"](db, labs[0])) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    fk = E["fuzzyKmeans"](X, 2)
    U = E["getMembershipMatrix"](fk)
    assert U.shape == (12, 2) and np.allclose(U.sum(axis=1), 1.0)
    mk = E["multiKmeans"](X, 2, 3)
    assert len(set(mk["labels"])) == 2
    hull = E["convexHull"]([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1]])
    assert E["getArea"](hull) == pytest.approx(4.0)
    assert E["getBoundarySize"](hull) == pytest.approx(8.0)
    assert np.allclose(E["getBaryCenter"](hull), [1.0, 1.0])
    disk = E["enclosingDisk"]([[0, 0], [2, 0], [1, 3], [1, 1]])
    assert E["getRadius"](disk) == pytest.approx(5.0 / 3.0, abs=1e-6)
    assert np.allclose(E["getCenter"](disk), [1.0, 4.0 / 3.0], atol=1e-6)


def test_gtest_corrpvalues_outliers_markov():
    E = mx.EVALS
    g = E["gtestDataSet"]([10, 20, 30], [15, 20, 25])
    assert g["G-statistic"] == pytest.approx(2.8300, abs=1e-3)
    assert 0.0 < g["p-value"] < 1.0
    p = E["corrPValues"]([[1.0, 0.5], [0.5, 1.0]], 20)
    assert p[0][1] == pytest.approx(0.0249, abs=2e-3)  # classic table value
    d = E["normalDistribution"](0, 1)
    out = E["outliers"](d, [-5.0, 0.0, 0.1, 6.0], 0.01, 0.99)
    assert list(out) == [-5.0, 6.0]
    mc = E["markovChain"]([[0.9, 0.1], [0.2, 0.8]])
    s = E["sample"](mc, 10)
    assert set(np.asarray(s)) <= {0.0, 1.0}
    with pytest.raises(mx.MathExprError):
        E["markovChain"]([[0.5, 0.4], [0.2, 0.8]])  # not row-stochastic


def test_second_tranche_signal_labels_misc():
    E = mx.EVALS
    w = E["oscillate"](2, 0.5, 0.1, 16)
    assert E["getAmplitude"](w) == 2.0
    assert E["getAngularFrequency"](w) == 0.5
    assert E["getPhase"](w) == 0.1
    assert w[1] == pytest.approx(2 * np.sin(0.6))
    m = E["setColumnLabels"]([[1, 2], [3, 4]], ["a", "b"])
    m = E["setRowLabels"](m, ["r0", "r1"])
    assert E["getColumnLabels"](m) == ["a", "b"]
    assert E["getRowLabels"](m) == ["r0", "r1"]
    assert E["getAttribute"](m, "colLabels") == ["a", "b"]
    assert E["knn"]([[0, 0], [5, 5], [1, 1]], [0.9, 0.9], 1).tolist() == [[1.0, 1.0]]
    assert E["convert"]("miles", "kilometers", 10) == pytest.approx(16.09344)
    d = E["enclosingDisk"]([[0, 0], [2, 0], [1, 3], [1, 1]])
    proj = E["projectToBorder"](d, [[1.0, 1.0]])
    assert np.allclose(proj, [[1.0, -1.0 / 3.0]], atol=1e-6)
    # bicubic is exact on a linear surface; 1-arg predict still dispatches
    x = y = np.arange(6.0)
    b = E["bicubicSpline"](x, y, np.add.outer(x, y))
    assert E["predict"](b, 2.5, 3.25) == pytest.approx(5.75)
    assert E["predict"]({"slope": 2.0, "intercept": 1.0}, 3.0) == 7.0


# --- round-5 wave 2: monteCarlo + object cache + cell ------------------------


def test_monte_carlo_lazy_resampling():
    from apache___solr_ray.streamexpr import parse_stream_expr

    node = parse_stream_expr("monteCarlo(mean(sample(normalDistribution(10, 2), 50)), 30)")
    out = mx.eval_node(node, {}, None)
    assert out.shape == (30,)
    # lazy re-evaluation: iterations draw DIFFERENT samples...
    assert len(set(np.round(out, 12))) > 1
    # ...that concentrate around the true mean
    assert abs(float(out.mean()) - 10.0) < 1.0
    # deterministic across runs
    out2 = mx.eval_node(parse_stream_expr(
        "monteCarlo(mean(sample(normalDistribution(10, 2), 50)), 30)"), {}, None)
    assert np.array_equal(out, out2)
    # seed offset restored: plain sample() unchanged by a prior monteCarlo
    s1 = mx.eval_node(parse_stream_expr("sample(normalDistribution(0, 1), 5)"), {}, None)
    assert mx._MC_OFFSET == 0
    s2 = mx.eval_node(parse_stream_expr("sample(normalDistribution(0, 1), 5)"), {}, None)
    assert np.array_equal(s1, s2)


def test_monte_carlo_guards():
    from apache___solr_ray.streamexpr import parse_stream_expr

    with pytest.raises(mx.MathExprError):
        mx.eval_node(parse_stream_expr("monteCarlo(add(1, 1))"), {}, None)
    with pytest.raises(mx.MathExprError):
        mx.eval_node(parse_stream_expr("monteCarlo(add(1, 1), 0)"), {}, None)


def test_object_cache_roundtrip_and_cell():
    from apache___solr_ray.streamexpr import parse_stream_expr

    mx._OBJECT_CACHE.clear()
    v = mx.eval_node(
        parse_stream_expr('putCache("sp", "k", array(1, 2, 3))'), {}, None
    )
    assert list(v) == [1.0, 2.0, 3.0]
    got = mx.eval_node(parse_stream_expr('getCache("sp", "k")'), {}, None)
    assert list(got) == [1.0, 2.0, 3.0]
    assert mx.eval_node(parse_stream_expr("listCache()"), {}, None) == ["sp"]
    assert mx.eval_node(parse_stream_expr('listCache("sp")'), {}, None) == ["k"]
    rem = mx.eval_node(parse_stream_expr('removeCache("sp", "k")'), {}, None)
    assert list(rem) == [1.0, 2.0, 3.0]
    with pytest.raises(mx.MathExprError):
        mx.eval_node(parse_stream_expr('getCache("sp", "k")'), {}, None)
    cellv = mx.eval_node(parse_stream_expr('cell("named", array(7, 8))'), {}, None)
    assert list(cellv) == ["named"] and list(cellv["named"]) == [7.0, 8.0]


def test_val_pivot_latlon_termvectors_evaluators():
    import numpy as np

    from apache___solr_ray import mathexpr

    assert mathexpr.EVALS["val"](7) == 7
    assert mathexpr.EVALS["val"]("raw") == "raw"

    tl = [
        {"x": "b", "y": "q", "v": 2.0},
        {"x": "a", "y": "p", "v": 1.0},
        {"x": "a", "y": "q", "v": 3.0},
    ]
    m = mathexpr.EVALS["pivot"](tl, "x", "y", "v")
    assert m.meta["rowLabels"] == ["a", "b"] and m.meta["colLabels"] == ["p", "q"]
    assert np.allclose(m, [[1.0, 3.0], [0.0, 2.0]])

    ll = mathexpr.EVALS["latlonVectors"](
        [{"loc": "1.5, 2.5", "id": 7}, {"loc": "3 4", "id": 8}], "loc"
    )
    assert np.allclose(ll, [[1.5, 2.5], [3.0, 4.0]])
    assert ll.meta["rowLabels"] == ["7", "8"]

    # reference formula: sqrt(tf) * (ln((n+1)/(df+1)) + 1); df window
    # [floor(n*minDf), floor(n*maxDf)]; features sorted; length filter
    docs = [
        {"id": 1, "terms": ["hello", "hello", "world", "xy"]},
        {"id": 2, "terms": ["world", "foo"]},
    ]
    tv = mathexpr.EVALS["termVectors"](docs, 3, 0.0, 1.0)
    assert tv.meta["colLabels"] == ["foo", "hello", "world"]
    n = 2
    want_hello = np.sqrt(2) * (np.log((n + 1) / 2) + 1)
    want_world = 1.0 * (np.log((n + 1) / 3) + 1)
    assert abs(tv[0][tv.meta["colLabels"].index("hello")] - want_hello) < 1e-12
    assert abs(tv[0][tv.meta["colLabels"].index("world")] - want_world) < 1e-12
    assert tv.meta["docFreqs"] == {"foo": 1, "hello": 1, "world": 2}
    # df pruning: world (df=2) alone survives [2, 2]
    tv2 = mathexpr.EVALS["termVectors"](docs, 3, 1.0, 1.0)
    assert tv2.meta["colLabels"] == ["world"]
