"""mapshaper_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-grounding of mapshaper's (DoveConviene/mapshaper) query and
data-processing capabilities as distributed DataFrame operators:

- two core tables mirror the reference data model (``features`` + shared
  ``arcs``; see /root/reference/src/paths/mapshaper-arcs.js:11-16),
- geometry math runs in vectorized numpy kernels inside Arrow-batched pandas
  UDFs (never per-row Python),
- candidate pruning for spatial joins uses a Z-order (Morton) cell index
  computed JVM-side with bitwise column expressions,
- skew is handled with salting + AQE, small polygon sets are broadcast.

Nothing in this package is a port of the reference's execution engine; only
the *semantics* (tie-break rules, first-match join behavior, threshold
formulas) are reproduced, with file:line citations in docstrings.
"""

__version__ = "0.1.0"

from mapshaper_spark.session import get_spark  # noqa: F401
