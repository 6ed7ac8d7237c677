"""catenae_kafka_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) covering the data-processing capability
surface of the catenae/catenae-kafka stream-processing framework,
re-expressed Spark-first:

- typed columnar DataFrames in place of pickled Kafka ``Electron`` messages
- declarative Catalyst-optimized plans in place of per-message Python
  ``Link.transform()`` code
- Structured Streaming (watermarks, windowed aggregation, state-store
  dedup) in place of hand-rolled timer loops and bounded dict/set
  structures
- a full relational operator set (scans, joins, aggregations, windows,
  set ops, scalar function packs, UDF surface) that catenae users had to
  hand-write inside transforms
- LLM-data-pipeline operators (exact/MinHash/SimHash dedup, cosine
  similarity search, text analysis, multimodal column plumbing) designed
  for 100 TB scale

Reference provenance: the checkout at /root/reference was empty at survey
time (SURVEY.md §0); capability surface reconstructed from public
knowledge of the catenae framework and defined by SURVEY.md §2.
"""

from catenae_kafka_spark.session import get_spark, tune
from catenae_kafka_spark.catalog import TABLES, catalog, load_tables, register_views
from catenae_kafka_spark.registry import QuerySpec, all_specs

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "tune",
    "TABLES",
    "catalog",
    "load_tables",
    "register_views",
    "QuerySpec",
    "all_specs",
    "__version__",
]
