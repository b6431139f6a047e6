from .base import Pipeline, Stage  # noqa: F401
