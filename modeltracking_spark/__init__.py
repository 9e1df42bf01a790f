"""modeltracking_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data capabilities of the
reference repo ``EavenW/Modeltracking`` (hurricane-track × HYCOM ocean-model
profile analytics; see ``trackplot_hycom.py`` / ``kmz2csv.py`` in the
reference), extended with the operators a large-scale training-data pipeline
needs: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search, text analysis, and multimodal column plumbing.

Design stance (not a port):
- Everything is declared with the DataFrame / Spark SQL API so Catalyst
  owns optimization (predicate pushdown, column pruning, join selection,
  AQE). No RDDs, no custom physical operators.
- The reference's per-point HTTP loops (``trackplot_hycom.py:144``,
  ``:109-111``) become one distributed join over a partitioned grid table.
- Python appears only at the edges (a Vincenty pandas UDF, multimodal
  decode stubs); every hot-path expression is a JVM builtin.
"""

__version__ = "0.1.0"
