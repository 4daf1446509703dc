"""bigdatamlteamrepo_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing and ML
capabilities of the reference repo ``murphl3/BigDataMLTeamRepo`` (see
``SURVEY.md``): DataFrame/SQL relational operators, text analysis,
dedup / similarity search, sampling & class-rebalancing, MLlib pipelines
(allergen classification, clustering + recommendation), and a Structured
Streaming surface over event streams.

Design stance (SURVEY.md §7):
  * DataFrame/MLlib only — no RDD API anywhere.
  * Explicit ``StructType`` schemas per source; no runtime inference.
  * No row-at-a-time Python UDFs where a built-in expression exists;
    Pandas UDFs (Arrow) for the rest.
  * Every SQL-expressible operator is mirrored by ANSI SQL for the
    DuckDB correctness oracle (``__spark_entry__.oracle_sql``).
  * Designed for 100 TB / multi-executor scale: broadcast joins for
    dims, partial aggregation, predicate pushdown, AQE, no unbounded
    driver-side collects.
"""

from bigdatamlteamrepo_spark.session import get_spark
from bigdatamlteamrepo_spark.catalog import TABLE_SCHEMAS, load_table, load_tables

__all__ = ["get_spark", "TABLE_SCHEMAS", "load_table", "load_tables"]
__version__ = "0.1.0"
