"""Pure-Python extractor chain — zero Spark/JVM dependencies.

This package is the single implementation of the per-document operators
A-1..A-22 (SURVEY.md §2.A). It is used (a) directly by pytest on golden
fixtures as the byte-identity oracle and (b) inside the Spark
``mapInPandas`` stage (operators/extract.py). Same bytes in → same
function → same bytes out, which makes the "byte-identical extracted
text per url" invariant (BASELINE.json:15) a testable theorem.

Parity note: behavior mirrors the public ``bmuller/readembedability``
parser chain (readability content scoring, metadata/OpenGraph/Twitter/
JSON-LD/oEmbed extractors, lead image, keywords, summary) as specified
by BASELINE.json:6; the reference checkout was empty so citations are
path-level recollections only (SURVEY.md §0).
"""

from readembedability_spark.extractor.pipeline import extract_page

__all__ = ["extract_page"]
