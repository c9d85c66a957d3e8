"""Text analysis stages: language id, quality scoring, token counting,
document fingerprinting.

Reference parity:
- language identification <- ``solr/modules/langid`` (LangDetect/OpenNLP
  URPs) — here a deterministic stopword/character-class n-gram heuristic
  (no external models in this container), run as a stateful actor stage;
- quality scoring — the URP-guard family (IgnoreLargeDocumentProcessor
  etc.) generalized to the standard web-corpus quality features
  (length / punctuation / stopword / digit ratios);
- token counting <- ``CountFieldValuesUpdateProcessorFactory`` +
  ``FieldLengthUpdateProcessorFactory`` semantics over analyzed tokens;
- fingerprinting <- ``SignatureUpdateProcessorFactory`` family; adds a
  rolling polynomial (Rabin-Karp) fingerprint.

All stages are vectorized ``pa.Table -> pa.Table`` callables.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from apache___solr_ray.analyze import simple_tokenize

#: tiny built-in stopword lists for the language-id heuristic
_LANG_STOPS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "por", "que", "una", "con"},
    "pt": {"o", "a", "os", "as", "e", "é", "não", "para", "que", "uma", "com"},
}


class LangIdStage:
    """Heuristic language id: stopword-hit ratio per language + script class.

    Stateful stage (stop sets built once per actor): use with
    ``ds.map_batches(LangIdStage, concurrency=N, batch_format="pyarrow")``.
    """

    def __init__(self, col: str = "text", out: str = "lang_pred"):
        self.col, self.out = col, out
        self.stops = {k: frozenset(v) for k, v in _LANG_STOPS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = []
        for text in t.column(self.col).to_pylist():
            toks = simple_tokenize(text or "")
            if not toks:
                preds.append("und")
                continue
            # CJK heuristic before stopwords
            sample = (text or "")[:200]
            if any("一" <= ch <= "鿿" for ch in sample):
                preds.append("zh")
                continue
            best, best_hits = "und", 0
            for lang, stops in self.stops.items():
                hits = sum(1 for tk in toks if tk in stops)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best if best_hits > 0 else "und")
        return t.append_column(self.out, pa.array(preds, pa.string()))


def quality_features(col: str = "text"):
    """Vectorized quality features: n_chars, n_tokens, n_unique_tokens,
    mean_token_len, digit_ratio, upper_ratio, space_ratio."""

    def run(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_pylist()
        n_chars, n_tokens, n_unique, mean_len, digit_r, upper_r, space_r = [], [], [], [], [], [], []
        for x in texts:
            x = x or ""
            toks = simple_tokenize(x)
            n_chars.append(len(x))
            n_tokens.append(len(toks))
            n_unique.append(len(set(toks)))
            mean_len.append(sum(map(len, toks)) / len(toks) if toks else 0.0)
            n = max(1, len(x))
            digit_r.append(sum(c.isdigit() for c in x) / n)
            upper_r.append(sum(c.isupper() for c in x) / n)
            space_r.append(sum(c.isspace() for c in x) / n)
        def fr4(vals):
            # floor(x*1e4+0.5)/1e4 — bit-exact vs the SQL mirror (common.floor_round)
            return pa.array(np.floor(np.asarray(vals, dtype=np.float64) * 1e4 + 0.5) / 1e4)

        return (
            t.append_column("n_chars_q", pa.array(n_chars, pa.int64()))
            .append_column("n_tokens", pa.array(n_tokens, pa.int64()))
            .append_column("n_unique_tokens", pa.array(n_unique, pa.int64()))
            .append_column("mean_token_len", fr4(mean_len))
            .append_column("digit_ratio", fr4(digit_r))
            .append_column("upper_ratio", fr4(upper_r))
            .append_column("space_ratio", fr4(space_r))
        )

    return run


def fingerprint_md5(col: str, out: str = "fingerprint"):
    """md5 of the normalized token stream (' '-joined simple tokens) —
    matches SQL ``md5(array_to_string(tokens, ' '))`` exactly."""

    def run(t: pa.Table) -> pa.Table:
        vals = [
            hashlib.md5(" ".join(simple_tokenize(x or "")).encode()).hexdigest()
            for x in t.column(col).to_pylist()
        ]
        return t.append_column(out, pa.array(vals, pa.string()))

    return run


def rolling_fingerprint(col: str, out: str = "rk_fingerprint", base: int = 1_000_003, mod: int = (1 << 61) - 1):
    """Rabin-Karp polynomial fingerprint over the token stream (order
    sensitive, incremental-friendly)."""

    def run(t: pa.Table) -> pa.Table:
        vals = []
        for x in t.column(col).to_pylist():
            h = 0
            for tok in simple_tokenize(x or ""):
                th = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                h = (h * base + th) % mod
            vals.append(h)
        return t.append_column(out, pa.array(np.array(vals, dtype=np.uint64)))

    return run


class QualityModelScorer:
    """Batched model inference as an actor-pool stage — the
    training-data-pipeline "quality classifier" shape (and the engine's
    ClassificationUpdateProcessor scoring analog): the model (here a
    deterministic logistic regression over quality features) is "loaded"
    ONCE per actor in ``__init__``; ``__call__`` scores a whole Arrow batch
    vectorized. Swap ``self.w`` for real learned weights (or a model file
    read) without touching the Ray plumbing.

    score = sigmoid(w0 + w1·ln(1+n_tokens) + w2·digit_ratio
                    + w3·unique_ratio), floor-rounded to 4dp so a SQL
    oracle can mirror it (same IEEE DOUBLE ops in the same order)."""

    W = (-1.5, 0.55, -8.0, 2.0)

    def __init__(self):
        self.w = np.asarray(self.W, dtype=np.float64)  # "model load"
        self._features = quality_features("text")

    def __call__(self, t: pa.Table) -> pa.Table:
        f = self._features(t)
        n_tokens = f.column("n_tokens").to_numpy().astype(np.float64)
        n_unique = f.column("n_unique_tokens").to_numpy().astype(np.float64)
        digit_r = f.column("digit_ratio").to_numpy()
        uniq_r = n_unique / np.maximum(n_tokens, 1.0)
        w = self.w
        z = w[0] + w[1] * np.log1p(n_tokens) + w[2] * digit_r + w[3] * uniq_r
        score = 1.0 / (1.0 + np.exp(-z))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "quality_score": pa.array(np.floor(score * 1e4 + 0.5) / 1e4),
            }
        )
