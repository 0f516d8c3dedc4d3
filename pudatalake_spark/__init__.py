"""pudatalake_spark: a PySpark-native data-lake analytics engine.

Capability surface: SURVEY.md §2 (relational operators, window
functions, streaming formulations, LLM-data-pipeline operators),
verified against a DuckDB oracle per the driver contract in
``__spark_entry__.py``.
"""

from .registry import oracles, queries  # noqa: F401
from .session import get_spark  # noqa: F401
from .loaders import load  # noqa: F401
