"""readembedability-spark: PySpark-native main-content extraction engine.

A from-scratch reimplementation of the capabilities of the public
``bmuller/readembedability`` library (MIT), re-expressed Spark-first:
the per-document extractor chain is a pure-Python package
(:mod:`readembedability_spark.extractor`, zero Spark deps) executed inside a
single vectorized Arrow ``mapInPandas`` stage; everything relational
(scan, filter, dedup, salting, joins, metrics, checkpoint-resume) is the
Spark DataFrame API so Catalyst owns the physical plan.

See SURVEY.md for the full blueprint. The reference checkout at
/root/reference was empty (SURVEY.md §0), so parity citations are to
BASELINE.json's binding spec rather than reference file:line.
"""

__version__ = "0.1.0"
