from . import stateful, stream  # noqa: F401
