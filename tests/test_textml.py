"""Text-ML streams: information-gain feature selection vs a brute pandas
recomputation, and logistic training on a separable fixture (the
reference's FeaturesSelectionStream / TextLogitStream surface)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from apache___solr_ray.streamexpr import StreamExprError, stream_expr
from apache___solr_ray.textml import features_selection, text_logit

SF = "/root/testdata/sf0.001"


def test_features_selection_matches_brute(ray_session):
    import pandas as pd

    from apache___solr_ray.analyze import simple_tokenize

    df = pd.read_parquet(f"{SF}/documents.parquet", columns=["text", "lang"])
    pos = (df.lang == "en").to_numpy()
    n, npos = len(df), int(pos.sum())

    from collections import Counter

    a_cnt, df_cnt = Counter(), Counter()
    for i, txt in enumerate(df.text):
        toks = set(simple_tokenize(txt or ""))
        df_cnt.update(toks)
        if pos[i]:
            a_cnt.update(toks)

    def h(p):
        if p <= 0 or p >= 1:
            return 0.0
        return -(p * np.log2(p) + (1 - p) * np.log2(1 - p))

    hc = h(npos / n)
    scores = {}
    for w, d in df_cnt.items():
        a = a_cnt.get(w, 0)
        rest = n - d
        hct = h(a / d)
        hcnt = h((npos - a) / rest) if rest else 0.0
        scores[w] = round(hc - d / n * hct - rest / n * hcnt, 10)
    want = sorted(scores, key=lambda w: (-scores[w], w))[:15]

    got = stream_expr(
        SF,
        "featuresSelection(documents, field=text, outcome=lang,"
        " positiveLabel=en, numTerms=15)",
    ).to_pandas()
    assert list(got.term) == want
    assert np.allclose(got.score, [scores[w] for w in want])
    assert list(got.idx) == list(range(15))


def test_text_logit_learns_separable_labels(ray_session):
    # clearly separable synthetic corpus: positive docs use fruit words,
    # negative docs use animal words
    rows = []
    for i in range(200):
        if i % 2 == 0:
            rows.append({"body": f"apple banana cherry doc{i}", "label": "pos"})
        else:
            rows.append({"body": f"zebra yak walrus doc{i}", "label": "neg"})
    ds = ray.data.from_arrow(
        pa.table(
            {
                "body": pa.array([r["body"] for r in rows]),
                "label": pa.array([r["label"] for r in rows]),
            }
        )
    )
    w, err, it = text_logit(
        ds, "body", "label", "pos",
        terms=["apple", "banana", "zebra", "walrus"],
        max_iterations=30,
    )
    assert it == 30
    assert err == 0.0  # perfectly separable => zero train error
    assert w[1] > 0 and w[2] > 0  # fruit weights positive
    assert w[3] < 0 and w[4] < 0  # animal weights negative


def test_text_logit_stream_beats_base_rate(ray_session):
    df = stream_expr(
        SF,
        "textLogit(documents, field=text, outcome=lang, positiveLabel=en,"
        " maxIterations=15, featuresSelection(documents, field=text,"
        " outcome=lang, positiveLabel=en, numTerms=15))",
    ).to_pandas()
    assert df.term[0] == "__bias__"
    assert len(df) == 16
    # the weakly-separable corpus: training must never do worse than the
    # majority-class predictor
    import pandas as pd

    lang = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"]).lang
    base = min((lang == "en").mean(), (lang != "en").mean())
    assert df.trainError[0] <= base + 1e-9


def test_textml_errors(ray_session):
    with pytest.raises(StreamExprError, match="field="):
        stream_expr(SF, "featuresSelection(documents, outcome=lang)")
    with pytest.raises(StreamExprError, match="terms"):
        stream_expr(SF, "textLogit(documents, field=text, outcome=lang)")
