"""modeltracking_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data capabilities of the
reference repo ``EavenW/Modeltracking`` (hurricane-track × HYCOM ocean-model
profile analytics; see ``trackplot_hycom.py`` / ``kmz2csv.py`` in the
reference), extended with the operators a large-scale training-data pipeline
needs: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard, with
connected-components clustering), similarity search (brute / hyperplane-LSH
/ IVF), text analysis (metrics, quality, language ID, winnowing
fingerprints, decontamination, repetition), deterministic hash sampling and
splits, sequence packing, multimodal column plumbing, and Structured
Streaming (windows, stateful ops, stream-static joins).

Design stance (not a port):
- Everything is declared with the DataFrame / Spark SQL API so Catalyst
  owns optimization (predicate pushdown, column pruning, join selection,
  AQE). No RDDs, no custom physical operators.
- The reference's per-point HTTP loops (``trackplot_hycom.py:144``,
  ``:109-111``) become one distributed join over a partitioned grid table.
- Python off the hot path unless it wins: every Python kernel is
  Arrow-batched and vectorized (Vincenty, winnowing rolling hash, IVF
  centroid matmul, multimodal decode stubs); everything else is a JVM
  builtin inside whole-stage codegen.
"""

__version__ = "0.1.0"
