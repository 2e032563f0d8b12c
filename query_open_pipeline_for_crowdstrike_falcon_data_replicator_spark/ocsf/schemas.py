"""The 13 fixed OCSF v1.2.0 output schemas as Spark StructTypes.

Transcribed from the reference's Glue tables
(src/cfn_yaml/QOPCFDR_SchemaTransformation_CFN.yaml:282-1214), which are the
authoritative sink schemas the Firehose JSON->Parquet conversion used.

Deviations from the Glue DDL (all deliberate, see FIDELITY.md):
- the two type-string typos in the Detection Finding ``evidences`` column
  (`strut<`, missing comma; YAML :1203) are fixed to the intended shape
  (the dict built at qopcfdr_stream_loader.py:3219-3248);
- the trailing ``partition_0`` crawler artifact is dropped;
- partition columns ``region``, ``accountId``, ``eventDay`` are added at
  write time by the sink (create_qopcfdr_firehoses.py:136), not stored here.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

S = StringType()
L = LongType()
T = TimestampType()
MAP_SS = MapType(S, S)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# Shared sub-structs (Glue field order preserved)
OBSERVABLE = _st(("name", S), ("type", S), ("type_id", L), ("value", S))
OBSERVABLES = ArrayType(OBSERVABLE)

PRODUCT = _st(("lang", S), ("name", S), ("vendor_name", S), ("url_string", S))
METADATA = _st(
    ("uid", S),
    ("log_name", S),
    ("log_provider", S),
    ("version", S),
    ("profiles", ArrayType(S)),
    ("product", PRODUCT),
)

AGENT = _st(
    ("uid", S),
    ("name", S),
    ("version", S),
    ("type_id", L),
    ("type", S),
    ("vendor_name", S),
)
AGENT_LIST = ArrayType(AGENT)

OS_STRUCT = _st(("type_id", L), ("type", S))

DEVICE = _st(("ip", S), ("uid", S), ("os", OS_STRUCT), ("agent_list", AGENT_LIST))

# endpoint with os+agent_list, used by dns/auth/file-hosting src_endpoint
HOST_ENDPOINT = _st(("ip", S), ("uid", S), ("os", OS_STRUCT), ("agent_list", AGENT_LIST))

HASH = _st(("algorithm_id", L), ("algorithm", S), ("value", S))
HASHES = ArrayType(HASH)
# Detection Finding uses the other field order (YAML :1203)
HASH_ALG_FIRST = _st(("algorithm", S), ("algorithm_id", L), ("value", S))


def _envelope(*, with_status_code: bool = False) -> list[StructField]:
    fields = [
        StructField("activity_id", L),
        StructField("activity_name", S),
        StructField("category_name", S),
        StructField("category_uid", L),
        StructField("class_name", S),
        StructField("class_uid", L),
        StructField("severity", S),
        StructField("severity_id", L),
        StructField("status", S),
        StructField("status_id", L),
    ]
    if with_status_code:
        fields.append(StructField("status_code", S))
    fields += [
        StructField("type_name", S),
        StructField("type_uid", L),
        StructField("time", T),
        StructField("message", S),
        StructField("observables", OBSERVABLES),
        StructField("metadata", METADATA),
    ]
    return fields


def _table(class_fields: list[StructField], *, with_status_code: bool = False,
           with_unmapped: bool = True) -> StructType:
    fields = _envelope(with_status_code=with_status_code) + class_fields
    if with_unmapped:
        fields.append(StructField("unmapped", MAP_SS))
    return StructType(fields)


# Process Activity (1007) — YAML :282-350
PROCESS_ACTIVITY = _table([
    StructField("device", DEVICE),
    StructField(
        "process",
        _st(
            ("cmd_line", S),
            ("created_time", T),
            ("pid", L),
            ("uid", S),
            ("file", _st(("name", S), ("hashes", HASHES))),
            (
                "parent_process",
                _st(
                    ("cmd_line", S),
                    ("created_time", T),
                    ("uid", S),
                    ("file", _st(("name", S),)),
                ),
            ),
        ),
    ),
])

# Network Activity (4001) — YAML :352-422
NETWORK_ACTIVITY = _table([
    StructField(
        "connection_info",
        _st(
            ("direction", S),
            ("direction_id", L),
            ("uid", S),
            ("protocol_ver", S),
            ("protocol_ver_id", L),
        ),
    ),
    StructField(
        "src_endpoint",
        _st(
            ("ip", S),
            ("uid", S),
            ("mac", S),
            ("intermediate_ips", ArrayType(S)),
            ("os", OS_STRUCT),
            ("agent_list", AGENT_LIST),
        ),
    ),
    StructField("dst_endpoint", _st(("ip", S), ("port", L))),
])

# Device Config State (5002) — YAML :424-490
DEVICE_CONFIG_STATE = _table([StructField("device", DEVICE)])

# HTTP Activity (4002) — YAML :492-570
HTTP_ACTIVITY = _table(
    [
        StructField("actor", _st(("process", _st(("cmd_line", S),)),)),
        StructField("file", _st(("name", S),)),
        StructField(
            "src_endpoint",
            _st(
                ("ip", S),
                ("port", L),
                ("uid", S),
                ("os", OS_STRUCT),
                ("agent_list", AGENT_LIST),
            ),
        ),
        StructField("dst_endpoint", _st(("ip", S), ("port", L), ("domain", S))),
        StructField(
            "http_request",
            _st(("http_method", S), ("uid", S), ("url", _st(("hostname", S), ("path", S)))),
        ),
        StructField(
            "tls",
            _st(("version", S), ("ja3_hash", HASH_ALG_FIRST)),
        ),
    ],
    with_status_code=True,
)

# HTTP Activity, ExternalApiEvent variant — YAML :572-640 (no unmapped)
HTTP_ACTIVITY_EXTAPI = _table(
    [
        StructField(
            "http_request",
            _st(
                ("http_method", S),
                ("user_agent", S),
                ("length", S),
                ("uid", S),
                ("http_headers", ArrayType(_st(("name", S), ("value", S)))),
                ("url", _st(("path", S),)),
            ),
        ),
        StructField(
            "connection_info",
            _st(
                ("boundary_id", L),
                ("boundary", S),
                ("uid", S),
                ("direction_id", L),
                ("direction", S),
                ("protocol_ver_id", L),
                ("protocol_ver", S),
                ("protocol_name", S),
                ("protocol_num", L),
                ("session", _st(("credential_uid", S),)),
            ),
        ),
        StructField(
            "src_endpoint",
            _st(
                ("ip", S),
                ("uid", S),
                (
                    "owner",
                    _st(
                        ("uid", S),
                        ("type_id", L),
                        ("type", S),
                        ("account", _st(("uid", S), ("type_id", L), ("type", S))),
                    ),
                ),
                ("agent_list", AGENT_LIST),
            ),
        ),
    ],
    with_unmapped=False,
)

# File System Activity (1001) — YAML :642-710
FILE_SYSTEM_ACTIVITY = _table([
    StructField("device", DEVICE),
    StructField(
        "file",
        _st(
            ("name", S),
            ("uid", S),
            ("path", S),
            ("type_id", L),
            ("type", S),
            ("confidentiality_id", L),
            ("confidentiality", S),
            ("creator", _st(("name", S),)),
            ("hashes", HASHES),
        ),
    ),
])

# DNS Activity (4003) — YAML :712-784
DNS_ACTIVITY = _table([
    StructField("src_endpoint", HOST_ENDPOINT),
    StructField("query", _st(("opcode", S), ("opcode_id", L), ("hostname", S))),
    StructField("rcode_id", L),
    StructField("rcode", S),
])

# Authentication (3002) — YAML :786-862
AUTHENTICATION = _table([
    StructField("src_endpoint", HOST_ENDPOINT),
    StructField("logon_process", _st(("pid", L),)),
    StructField(
        "user",
        _st(("name", S), ("uid", S), ("uid_alt", S), ("type", S), ("type_id", L)),
    ),
    StructField("session", _st(("uid", S), ("uuid", S), ("uid_alt", S))),
    StructField("logon_type", S),
    StructField("logon_type_id", L),
])

# File Hosting Activity (6006) — YAML :864-934
FILE_HOSTING_ACTIVITY = _table([
    StructField("src_endpoint", HOST_ENDPOINT),
    StructField("dst_endpoint", _st(("hostname", S), ("port", L))),
    StructField(
        "file",
        _st(
            ("name", S),
            ("confidentiality_id", L),
            ("confidentiality", S),
            ("hashes", HASHES),
        ),
    ),
])

# Module Activity (1005) — YAML :936-1004
MODULE_ACTIVITY = _table([
    StructField("device", DEVICE),
    StructField(
        "module",
        _st(
            ("function_name", S),
            ("load_type_id", L),
            ("load_type", S),
            ("file", _st(("name", S), ("hashes", HASHES))),
        ),
    ),
])

# Application Lifecycle (6002) — YAML :1006-1074
APPLICATION_LIFECYCLE = _table([
    StructField("device", DEVICE),
    StructField("app", _st(("name", S), ("uid", S), ("vendor_name", S), ("version", S))),
])

# Operating System Patch State (5004) — YAML :1076-1144
OS_PATCH_STATE = _table([
    StructField("device", DEVICE),
    StructField("kb_article_list", ArrayType(_st(("uid", S),))),
])

# Detection Finding (2004) — YAML :1146-1214 (evidences typos fixed)
DETECTION_FINDING = _table([
    StructField("device", DEVICE),
    StructField(
        "evidences",
        ArrayType(
            _st(
                (
                    "process",
                    _st(
                        ("cmd_line", S),
                        ("uid", S),
                        ("file", _st(("name", S), ("hashes", ArrayType(HASH_ALG_FIRST)))),
                        (
                            "parent_process",
                            _st(
                                ("cmd_line", S),
                                ("file", _st(("name", S),)),
                                (
                                    "parent_process",
                                    _st(("cmd_line", S), ("file", _st(("name", S),))),
                                ),
                            ),
                        ),
                    ),
                ),
            )
        ),
    ),
])


# Table key -> (OCSF class name, class_uid, StructType).  Table keys are the
# snake_case sink names (qopcfdr_firehose_metadata.json / Glue table names).
OCSF_SCHEMAS: dict[str, tuple[str, int, StructType]] = {
    "process_activity": ("Process Activity", 1007, PROCESS_ACTIVITY),
    "network_activity": ("Network Activity", 4001, NETWORK_ACTIVITY),
    "device_config_state": ("Device Config State", 5002, DEVICE_CONFIG_STATE),
    "http_activity": ("HTTP Activity", 4002, HTTP_ACTIVITY),
    "http_activity_extapi": ("HTTP Activity", 4002, HTTP_ACTIVITY_EXTAPI),
    "file_system_activity": ("File System Activity", 1001, FILE_SYSTEM_ACTIVITY),
    "dns_activity": ("DNS Activity", 4003, DNS_ACTIVITY),
    "authentication": ("Authentication", 3002, AUTHENTICATION),
    "file_hosting_activity": ("File Hosting Activity", 6006, FILE_HOSTING_ACTIVITY),
    "module_activity": ("Module Activity", 1005, MODULE_ACTIVITY),
    "application_lifecycle": ("Application Lifecycle", 6002, APPLICATION_LIFECYCLE),
    "operating_system_patch_state": ("Operating System Patch State", 5004, OS_PATCH_STATE),
    "detection_finding": ("Detection Finding", 2004, DETECTION_FINDING),
}

TABLE_KEYS = tuple(OCSF_SCHEMAS)


def schema_for(table_key: str) -> StructType:
    return OCSF_SCHEMAS[table_key][2]
