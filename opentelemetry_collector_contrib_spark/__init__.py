"""PySpark-native analytics engine with the query/data-processing
capabilities of glassflow/opentelemetry-collector-contrib.

A from-scratch, Spark-first reimplementation of the reference's
parse -> enrich -> route -> aggregate telemetry pipeline semantics
(receivers/processors/connectors/exporters) as declarative DataFrame
transformations, plus large-scale training-data operations
(dedup, similarity search, text analysis, multimodal plumbing).

Not a port: the reference is an event-at-a-time Go interpreter; here the
logical plan is declared with the DataFrame API and Catalyst/Tungsten pick
the physical strategy.
"""

__version__ = "0.1.0"

from .session import build_session  # noqa: F401
