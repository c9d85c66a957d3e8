"""Unified-highlighter passage scoring: tie-breaks and score ordering
(pure-function tests over best_passage_rows — the same code path the
highlight_unified catalog entry runs per batch)."""

from apache___solr_ray.pipelines.text import _HL_WINDOW, best_passage_rows


def _doc(*windows):
    """Build a text whose w-th 20-token window is windows[w] (padded)."""
    toks = []
    for w in windows:
        pad = ["zz"] * (_HL_WINDOW - len(w))
        toks.extend(list(w) + pad)
    return " ".join(toks)


IDF = {"merge": 1.5, "fast": 1.0, "index": 0.25}


def test_tiebreak_smallest_window_wins():
    # windows 0 and 2 contain the identical term set -> identical rounded
    # score -> the SMALLEST window index wins (row_number ORDER BY score
    # DESC, w ASC in the SQL mirror)
    text = _doc(["merge", "fast"], ["index"], ["fast", "merge"])
    ids, ws, ss, snips = best_passage_rows([text], [7], IDF)
    assert ids == [7] and ws == [0]
    assert ss == [2.5]
    assert snips[0].startswith("merge fast")


def test_higher_score_beats_position():
    # window 1 scores higher than window 0 -> position does not matter
    text = _doc(["index"], ["merge", "fast", "index"])
    ids, ws, ss, _ = best_passage_rows([text], [1], IDF)
    assert ws == [1] and ss == [2.75]


def test_unique_terms_counted_once_per_passage():
    # repeated term inside one window counts once (UnifiedHighlighter
    # passage scoring is per unique term)
    text = _doc(["merge", "merge", "merge"], ["merge", "fast"])
    ids, ws, ss, _ = best_passage_rows([text], [2], IDF)
    assert ws == [1] and ss == [2.5]


def test_docs_without_hits_are_dropped():
    ids, ws, ss, _ = best_passage_rows(["nothing here", None], [1, 2], IDF)
    assert ids == [] and ws == [] and ss == []
