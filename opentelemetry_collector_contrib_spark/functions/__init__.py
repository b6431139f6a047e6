from . import grok, hashes, ottl, timefmt  # noqa: F401
