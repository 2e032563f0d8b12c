"""FDR epoch-string -> timestamp coercion (reference
qopcfdr_stream_loader.py:216-225).

The reference tries ``datetime.fromtimestamp(float(x))`` (seconds) and, on
ValueError (year > 9999), retries with ``x/1000`` (milliseconds).  The exact
seconds-vs-milliseconds pivot is therefore the datetime year-10000 limit:
epoch seconds 253402300800.  It then truncates to millisecond precision
(``strftime('%f')[:-3]``) in the UTC Lambda timezone.

Here: one branch-free column expression, millisecond truncation, session
timezone pinned to UTC by the caller.  Missing timestamps default to the
reference's 1998-04-24 sentinel (qopcfdr_stream_loader.py:254-255).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# epoch-seconds value at which datetime.fromtimestamp overflows year 9999
_SECONDS_LIMIT = 253402300800.0

# "24 APR 1998 02:07:39 GMT" — default for events missing `timestamp`
TIMESTAMP_SENTINEL = "893383659000"


def fdr_timestamp(col: Column) -> Column:
    """Parse an FDR epoch string (seconds or milliseconds, autodetected the
    way the reference does) into a millisecond-precision TimestampType."""
    d = col.cast("double")
    secs = F.when(d >= _SECONDS_LIMIT, d / 1000.0).otherwise(d)
    return F.timestamp_millis(F.floor(secs * 1000).cast("long"))
