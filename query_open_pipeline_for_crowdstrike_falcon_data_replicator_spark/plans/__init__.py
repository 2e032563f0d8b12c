from .relational import RELATIONAL_QUERIES  # noqa: F401
