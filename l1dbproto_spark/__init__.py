"""l1dbproto_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of lsst-dm/l1dbproto (the LSST Alert Production
Database prototype / benchmark harness).

Everything here is a *re-expression* of the reference workload (see SURVEY.md)
in idiomatic Spark: DataFrame/SQL plans optimized by Catalyst, native column
expressions instead of row-wise pandas, Structured Streaming for the streaming
surfaces, and Arrow-batched pandas UDFs only where built-ins genuinely cannot
express the semantics.

Layout:
  session     — SparkSession builder tuned for local[N] and cluster use
  checkpoint  — the engine-wide lineage-cut switch (pin;
                checkpoint_mode local|reliable for preemptible clusters)
  schemas     — StructType registry for the APDB tables (felis-type mapping)
  functions/  — scalar expression libraries (geo, time, text, vector, pixel)
  operators/  — composite DataFrame operators (windows, dedup, similarity, ...)
  sources/    — readers/sinks (parquet catalog, log lines, csv/influx)
  plans/      — plan-time helpers (spherical regions -> pixel range predicates)
  workload/   — the AP visit-loop workload re-expressed (DIA, generators, geom)
  streaming/  — Structured Streaming variants (visit loop, metrics pipeline)
  queries/    — the registered query surface checked against a DuckDB oracle
  apdb        — the Apdb-contract API layer (getDiaObjects/getDiaSources/store)
"""

__version__ = "0.1.0"
