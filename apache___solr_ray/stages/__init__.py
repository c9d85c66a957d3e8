"""Reusable per-batch stages (the update-request-processor layer).

Each submodule maps a family from the reference's operator inventory
(SURVEY §2.2, §2.7) to vectorized ``map_batches`` callables:

- ``urp``        — field normalizers/parsers (TrimField, RegexReplace, ...)
- ``dedup``      — exact + fuzzy signatures, MinHash-LSH, SimHash, n-gram
                   Jaccard, embedding near-dup
- ``textstats``  — language id, quality scoring, token counts, fingerprints
- ``multimodal`` — binary-payload (image/audio) stage plumbing with stubbed
                   decoders
"""
