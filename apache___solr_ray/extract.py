"""HTML → text extraction with frozen, deterministic semantics.

Reference behavior being rebuilt: Solr strips HTML at ingest through Lucene's
``HTMLStripCharFilter`` (reference call site
``solr/core/src/java/org/apache/solr/update/processor/
HTMLStripFieldUpdateProcessorFactory.java:64``) and extracts rich documents
via the extraction module (``SolrContentHandler.java``). The conformance
contract (BASELINE.json per-row invariant) is **byte-identical extracted text
per url** against the fixture goldens.

Frozen semantics (documented, version-independent — no ambient HTML libs):

1. ``<!-- ... -->`` comments are removed, content included.
2. ``<script ...> ... </script>`` and ``<style ...> ... </style>`` elements
   are removed **with their content** (case-insensitive).
3. Tags ``</?X ...>`` where X is a letter, ``!`` or ``?`` are removed
   (covers ``<!DOCTYPE ...>`` and processing instructions). A ``<`` not
   followed by a tag start is literal text (HTML5 rule).
4. Character references are decoded in a single left-to-right pass
   (``html.unescape`` semantics).

``extract_text`` is the scalar spec; ``extract_batch`` is the vectorized
Arrow implementation used in the pipeline (pyarrow re2 kernels + chained
entity replaces for the closed entity set, falling back to the scalar spec
for rows with other entities). Tests assert the two agree.
"""

from __future__ import annotations

import html
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.S | re.I)
_TAG_RE = re.compile(r"</?[a-zA-Z!?][^>]*>")


def extract_text(html_doc: bytes | str) -> str:
    """Scalar reference implementation of the frozen extraction semantics."""
    s = html_doc.decode("utf-8") if isinstance(html_doc, (bytes, bytearray)) else html_doc
    s = _COMMENT_RE.sub("", s)
    s = _SCRIPT_RE.sub("", s)
    s = _STYLE_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return html.unescape(s)


# re2 syntax for the pyarrow kernels ((?s) dotall, (?i) case-insensitive).
_RE2_STEPS = [
    r"(?s)<!--.*?-->",
    r"(?si)<script\b[^>]*>.*?</script\s*>",
    r"(?si)<style\b[^>]*>.*?</style\s*>",
    r"</?[a-zA-Z!?][^>]*>",
]

#: Closed entity set decoded vectorized; &amp; last (single-pass semantics).
_ENTITY_STEPS = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#x27;", "'"),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

#: Any leftover entity-looking pattern routes the row to the scalar fallback.
_FALLBACK_RE2 = r"&[a-zA-Z]{2,31};|&#[0-9xX]"


def extract_batch(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized extraction: binary/string column -> string column.

    Fast path is entirely pyarrow re2 kernels (zero-copy from the object
    store). Rows containing entities outside the closed set are re-done with
    the scalar spec so the two implementations never diverge.
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    s = html_col
    if pa.types.is_binary(s.type) or pa.types.is_large_binary(s.type):
        s = s.cast(pa.large_string() if pa.types.is_large_binary(s.type) else pa.string())
    for pat in _RE2_STEPS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement="")
    # scalar fallback BEFORE entity decode (the check looks at raw entities)
    needs_fallback = pc.match_substring_regex(s, _FALLBACK_RE2)
    for ent, rep in _ENTITY_STEPS:
        s = pc.replace_substring(s, pattern=ent, replacement=rep)
    if pc.any(needs_fallback).as_py():
        mask = needs_fallback.to_numpy(zero_copy_only=False)
        vals = s.to_pylist()
        raw = html_col.to_pylist()
        for i in np.flatnonzero(mask):
            vals[i] = extract_text(raw[i])
        s = pa.array(vals, type=pa.string())
    return s


# ---------------------------------------------------------------------------
# Deterministic HTML renderer (used by the synthetic corpus generator):
# wraps ground-truth text so that extract(render(text)) == text byte-for-byte
# while exercising comments, script/style, nesting, entities and malformed
# tags (FIXTURES.md §1).
# ---------------------------------------------------------------------------


def _escape(s: str, alt_quote: bool) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if alt_quote:
        s = s.replace("'", "&#x27;")
    return s


def render_html(text: str, seed: int) -> str:
    """Deterministically wrap `text` in messy HTML.

    The char data of the result concatenates exactly to `text` (entities
    escaped); everything else (tags, comments, script/style, malformed bits)
    strips to nothing under the frozen semantics.
    """
    rnd = seed & 0xFFFFFFFF
    # split text at 1-3 points (at any byte position: chunk concatenation is
    # byte-exact regardless of split placement)
    n = len(text)
    cuts = sorted({1 + (rnd * (i + 7) * 2654435761 % max(1, n)) for i in range(rnd % 3)} & set(range(1, n)))
    chunks = []
    prev = 0
    for c in cuts:
        chunks.append(text[prev:c])
        prev = c
    chunks.append(text[prev:])
    body_parts = []
    wrappers = ["p", "div", "span", "b", "em"]
    for i, ch in enumerate(chunks):
        tag = wrappers[(rnd + i) % len(wrappers)]
        esc = _escape(ch, alt_quote=(i % 2 == 1))
        body_parts.append(f"<{tag} class=\"c{i}\">{esc}</{tag}>")
        if (rnd + i) % 4 == 0:
            body_parts.append(f"<!-- comment {i} <b>not text</b> -->")
        if (rnd + i) % 5 == 0:
            body_parts.append("<br/>")
    if rnd % 7 == 0:
        body_parts.append("<img src='x.png' alt=ignored>")
    head = (
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\"/>"
        f"<script type=\"text/javascript\">var x = {rnd % 100} < 200 && 1 > 0;</script>"
        "<style>body { margin: 0; } /* <p>styled</p> */</style>"
        "</head><body>"
    )
    return head + "".join(body_parts) + "</body></html>"
