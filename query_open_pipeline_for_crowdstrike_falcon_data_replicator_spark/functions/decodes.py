"""Decode/CASE tables (SURVEY.md §2.3-X2) as data + one shared ``decode``
expression builder — the reference hand-writes each of these as if/elif
chains, duplicated across normalizers (e.g. the platform decode appears 13
times, qopcfdr_stream_loader.py:543-557 et al.)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode(col: Column, table: dict[str, tuple], default: tuple) -> list[Column]:
    """Build N parallel CASE columns from a key column and a value-tuple
    table.  Returns one Column per tuple position."""
    width = len(default)
    out = []
    for i in range(width):
        expr = None
        for k, vals in table.items():
            cond = col == k
            expr = F.when(cond, F.lit(vals[i])) if expr is None else expr.when(cond, F.lit(vals[i]))
        out.append(expr.otherwise(F.lit(default[i])))
    return out


# event_platform -> (os.type_id, os.type); absent -> (0, Unknown); any other
# value -> (99, the value itself).  qopcfdr_stream_loader.py:543-557
PLATFORM_OS = {
    "Win": (100, "Windows"),
    "Lin": (200, "Linux"),
    "Mac": (300, "macOS"),
}


def platform_os(platform: Column) -> tuple[Column, Column]:
    type_id, type_name = decode(platform, PLATFORM_OS, (99, None))
    return (
        F.when(platform.isNull(), F.lit(0)).otherwise(type_id).cast("long"),
        F.when(platform.isNull(), F.lit("Unknown")).otherwise(
            F.coalesce(type_name, platform)
        ),
    )


# OCSF HTTP activity ids keyed by capitalized verb (qopcfdr_stream_loader.py:50-59)
HTTP_VERB_ACTIVITY = {
    "Connect": 1,
    "Delete": 2,
    "Get": 3,
    "Head": 4,
    "Options": 5,
    "Post": 6,
    "Put": 7,
    "Trace": 8,
}

# FDR HttpMethod decimal -> (activity_name, http_method, activity_id)
# qopcfdr_stream_loader.py:1203-1247.  "9"/Patch has no OCSF id (99) and the
# reference leaves http_method None for it.
HTTP_METHOD_DECIMAL = {
    "0": ("Unknown", None, 0),
    "1": ("Get", "GET", 3),
    "2": ("Head", "HEAD", 4),
    "3": ("Post", "POST", 6),
    "4": ("Put", "PUT", 7),
    "5": ("Delete", "DELETE", 2),
    "6": ("Options", "OPTIONS", 5),
    "7": ("Connect", "CONNECT", 1),
    "8": ("Trace", "TRACE", 8),
    "9": ("Patch", None, 99),
}

# ConnectionDirection -> (direction_id, direction); OUTBOUND=0 INBOUND=1
# NEITHER=2 BOTH=3 (qopcfdr_stream_loader.py:1035-1056)
CONNECTION_DIRECTION = {
    "0": (2, "Outbound"),
    "1": (1, "Inbound"),
    "2": (99, "Neither"),
    "3": (3, "Lateral"),
}

# Windows LogonType -> (logon_type_id, logon_type) (qopcfdr_stream_loader.py:2245-2285)
LOGON_TYPE = {
    "2": (2, "Interactive"),
    "3": (3, "Network"),
    "4": (4, "Batch"),
    "5": (5, "OS Service"),
    "7": (7, "Unlock"),
    "8": (8, "Network Cleartext"),
    "9": (9, "New Credentials"),
    "10": (10, "Remote Interactive"),
    "11": (11, "Cached Interactive"),
    "12": (12, "Cached Remote Interactive"),
    "13": (13, "Cached Unlock"),
}

# UpdateFlag -> (activity_id, activity_name, status_id, status)
# (qopcfdr_stream_loader.py:2460-2503)
UPDATE_FLAG = {
    "0": (99, "UPDATE_INVALID", 2, "Failure"),
    "1": (99, "UPDATE_ENUMERATION", 1, "Success"),
    "2": (2, "Remove", 1, "Success"),
    "3": (1, "Install", 1, "Success"),
    "4": (99, "UPDATE_OBSOLETE", 2, "Failure"),
    "5": (99, "UPDATE_REVISED", 1, "Success"),
}

# patch Status -> (activity_id, activity_name, status_id, status)
# (qopcfdr_stream_loader.py:2657-2675)
PATCH_STATUS = {
    "0": (1, "Install", 1, "Success"),
}
