"""PySpark-native real-time analytics engine.

A brand-new engine with the query/data-processing capabilities of
``GoogleCloudPlatform/redis-dataflow-realtime-analytics`` (a Beam/Dataflow
pipeline maintaining per-minute counters, HyperLogLog sketches and exact
user-sets in Redis, read back by a dashboard), re-expressed Spark-first:

* the reference's write-side key-shaping + commutative Redis mutation
  (``INCRBY``/``PFADD``/``SADD``) collapses into declarative
  ``groupBy(window(ts, '1 minute'), dims)`` aggregations
  (``operators.metrics``);
* the reference's read-side point lookups (``MGET``/``PFCOUNT``/``SCARD``/
  ``SINTERSTORE``) become pure DataFrame queries with a generated time axis
  and a variant-overlap self-join (``operators.timeseries``);
* streaming ingest is Structured Streaming with watermarks and a mergeable
  partial-aggregate store instead of Redis (``streaming.pipeline``);
* a full relational surface (``operators.relational``) and LLM-data-pipeline
  operators — dedup, similarity search, text analysis, multimodal plumbing —
  round out the engine (``operators.dedup`` / ``similarity`` / ``text`` /
  ``multimodal``).

Design north star: 100 TB on a 1000-executor cluster. Every operator
documents its shuffle/partitioning strategy and is written so Catalyst can
push filters, prune columns and pick broadcast joins.
"""

__version__ = "0.1.0"
