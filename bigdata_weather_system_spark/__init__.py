"""bigdata_weather_system_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / SQL / Catalyst / Structured
Streaming) engine with the same query and data-processing capabilities as the
reference system ``kan3103/bigdata-weather-system`` (a Kafka + PySpark +
FastAPI weather analytics pipeline), re-expressed Spark-first and extended
with the large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) the reference lacks.

Layout
------
- ``session``    — SparkSession factory (UTC, AQE, Arrow, sane shuffle sizing)
- ``schemas``    — canonical event schemas (weather event row, raw payload map)
- ``sources``    — parquet table loaders + the raw-JSON event parse chain
- ``operators``  — reusable DataFrame→DataFrame transforms (latest-per-key,
                   bucketed profiles, mode, sequences, dedup, similarity,
                   text analysis, multimodal plumbing)
- ``functions``  — scalar column helpers (cyclic time features, conversions)
- ``service``    — the reference's 7-endpoint query facade, quirk-compatible
- ``streaming``  — Structured Streaming pipelines sharing the batch transforms
- ``contract``   — the driver-contract query/oracle registry

Design stance: declare logical plans with the DataFrame API and let
Catalyst/Tungsten choose physical strategy; no RDDs, no driver-side loops in
hot paths, Pandas UDFs only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"
