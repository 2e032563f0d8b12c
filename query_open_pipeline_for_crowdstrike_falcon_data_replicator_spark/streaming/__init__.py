from .pipeline import run_stream  # noqa: F401
