"""PySpark-native analytics engine with the query/data-processing
capabilities of vkond/LOFAR-BF-pulsar-scripts (reference read-only at
/root/reference — studied for semantics only, re-built Spark-first).

Layout:
  session     — SparkSession factory tuned for the local[32] harness
  tables      — canonical loaders for the driver's parquet test tables
  operators/  — pure DataFrame -> DataFrame operators (SURVEY.md §2)
  functions/  — column-expression library (astro math, robust stats)
  sources/    — readers normalizing reference input formats (SURVEY §2.1)
  plans/      — pipelines recreating each reference script end-to-end
  streaming/  — Structured Streaming duals of the windowed operators
"""

__version__ = "0.1.0"
