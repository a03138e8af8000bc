"""connapse_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Connapse hybrid-search knowledge backend
(reference surveyed in SURVEY.md), plus LLM-data-pipeline operators (dedup,
similarity search, text analysis) designed for 100 TB scale.

Everything is expressed Spark-first: DataFrame/SQL plans that Catalyst can
optimize (pushdown, pruning, broadcast), with Pandas UDFs only where built-in
operators genuinely cannot express the semantics (token-aware chunking,
pluggable embedding providers).
"""

__version__ = "0.1.0"
