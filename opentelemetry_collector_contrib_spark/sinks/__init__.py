from . import fanout, formatter, lineage  # noqa: F401
