"""Named query registry (driver contract surface).

Importing this package registers every query family; the dicts below
are what ``__spark_entry__.queries()`` / ``oracle_sql()`` expose.
"""

from bigdatamlteamrepo_spark.queries.registry import BENCH_SET, ORACLE, QUERIES

# Importing for side effect: each module registers its queries.
from bigdatamlteamrepo_spark.queries import relational  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import events  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import text_dedup  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import similarity  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import extensions  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import analytic  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import multimodal_q  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import pipeline  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import shards  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import relational2  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import sketches  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import textmodel  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import graphs  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import passages  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import curation  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import health  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import baskets  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import spancorrupt  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import entropy  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import scd2  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import linkpred  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import textrank  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import bootstrap  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import cdc  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import regression  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import sequences  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import abtest  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import forecast  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import bars  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import changepoint  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import skyline  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import evalmetrics  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import wmedian  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import bursts  # noqa: F401,E402
from bigdatamlteamrepo_spark.queries import concurrency  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLE", "BENCH_SET"]
