"""pkg2_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
tinyrange/pkg2 ("Package Metadata Engine", /root/reference/README.md:1) on
Apache Spark. The reference snapshot contains no source code (see SURVEY.md
§0); the operator inventory implemented here is the contract in SURVEY.md §2,
each operator verified against a DuckDB oracle.

Design principles (SURVEY.md §4, §7):
- DataFrame/SQL only — every plan goes through Catalyst, so predicate
  pushdown, column pruning, join reordering, AQE, and whole-stage codegen
  apply without any custom rules.
- Determinism discipline (SURVEY.md §2.13) baked into every declared query so
  results hash-match DuckDB bit-for-bit.
- 100 TB posture: shuffle-friendly pipelines, broadcast for dims, no
  driver-side data loops, no per-node state that grows with corpus size.
"""

__version__ = "0.1.0"

from pkg2_spark.session import get_session  # noqa: F401
from pkg2_spark.catalog import load_tables, TABLES  # noqa: F401
