"""Importing this package populates the query registry (registry.QUERIES).

One module per SURVEY.md §2 category; every module registers its queries via
the @query decorator at import time.
"""

from pkg2_spark.queries import acid  # noqa: F401
from pkg2_spark.queries import aggregates  # noqa: F401
from pkg2_spark.queries import functions  # noqa: F401
from pkg2_spark.queries import joins  # noqa: F401
from pkg2_spark.queries import cdc  # noqa: F401
from pkg2_spark.queries import graph  # noqa: F401
from pkg2_spark.queries import llm  # noqa: F401
from pkg2_spark.queries import multimodal  # noqa: F401
from pkg2_spark.queries import packages  # noqa: F401
from pkg2_spark.queries import profiling  # noqa: F401
from pkg2_spark.queries import streaming  # noqa: F401
from pkg2_spark.queries import timeseries  # noqa: F401
from pkg2_spark.queries import training  # noqa: F401
from pkg2_spark.queries import udfs  # noqa: F401
from pkg2_spark.queries import relational  # noqa: F401
from pkg2_spark.queries import sketches  # noqa: F401
from pkg2_spark.queries import sorts_sets  # noqa: F401
from pkg2_spark.queries import sql_composite  # noqa: F401
from pkg2_spark.queries import windows  # noqa: F401
