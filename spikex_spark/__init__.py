"""spikex_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the query and data-processing capabilities of the reference
(erre-quadro/spikex, see /root/reference) as an idiomatic Spark DataFrame
pipeline: extract → block → pairwise-score → transitively cluster, plus the
reference's matcher / abbreviation / sentence / graph operators recast as
vectorized Arrow-UDF stages and DataFrame joins.

Design tenets (scale-first, for a 1000-executor cluster over ~100 TB):

* DataFrame/SQL only — Catalyst plans everything; no RDDs.
* Python touches data only through Arrow batches (``mapInPandas`` /
  ``pandas_udf``); never per-row Python UDFs.
* Every join is classified: broadcast for dimensions, shuffle-hash for
  blocking joins with explicit salt/cap for skewed keys.
* Iterative algorithms (connected components) checkpoint per round to
  truncate lineage, and converge in O(log n) rounds.
"""

__version__ = "0.1.0"
