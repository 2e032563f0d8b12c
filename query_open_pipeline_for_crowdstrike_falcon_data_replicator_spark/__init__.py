"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference FDR->OCSF pipeline
(query-ai/query_open_pipeline_for_crowdstrike_falcon_data_replicator).

The reference is an AWS-serverless streaming ETL (S3 -> Lambda -> SQS ->
Firehose -> Parquet -> Athena).  This package re-expresses the whole
dataflow as Spark DataFrame plans:

- ``sources``   gzip NDJSON readers (batch + structured streaming)
- ``ocsf``      the 13 fixed OCSF v1.2.0 output schemas + event mapping data
- ``functions`` shared column-expression builders (timestamps, decode maps,
                observables, residual ``unmapped`` maps)
- ``operators`` the 13 class normalizers, the router, plus training-data
                operators (dedup, similarity search, text analysis,
                multimodal plumbing)
- ``sinks``     partitioned Parquet writers (region/accountId/eventDay)
- ``streaming`` Structured Streaming driver (foreachBatch fan-out)
- ``plans``     the relational query surface (Spark SQL over the tables the
                reference delegated to Athena)
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
