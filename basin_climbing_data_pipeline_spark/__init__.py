"""basin_climbing_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``steelferguson/basin-climbing-data-pipeline``
(a single-process pandas ETL system; see SURVEY.md for the full structural
analysis).  Nothing here is a port: every pandas ``iterrows`` loop, dict-map
lookup, and hand-rolled incremental merge in the reference is re-expressed as
declarative DataFrame programs so Catalyst/Tungsten (predicate pushdown,
broadcast joins, whole-stage codegen, AQE) do the physical planning.

Layout
------
- ``session``    : SparkSession factory (local testing; cluster-safe defaults)
- ``io``         : parquet table catalog over ``/root/testdata/sf*``
- ``config``     : ordered keyword maps + price bands (config-driven semantics,
                   mirroring the reference's ``data_pipeline/config.py`` style)
- ``functions/`` : column-expression builders (text, datetime, money)
- ``operators/`` : DataFrame-in/DataFrame-out operator builders — the engine
- ``sources/``   : bronze-layer readers (csv/json/parquet compat)
- ``streaming/`` : Structured Streaming wrappers over the events table
- ``plans/``     : plan-inspection helpers (explain capture, shuffle audit)
"""

__version__ = "0.1.0"
