from .parquet import register_ocsf_tables, write_ocsf_tables  # noqa: F401
