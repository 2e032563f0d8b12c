"""Synthetic raw-FDR sample events (one per OCSF class + variants and
edge cases, mirroring FIXTURES.md) - used by tests, the pipeline demo and
the driver-contract smoke entry."""

from __future__ import annotations

SHA256 = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
SHA1 = "da39a3ee5e6b4b0d3255bfef95601890afd80709"
MD5 = "d41d8cd98f00b204e9800998ecf8427e"
JA3 = "771f0b7e1c7bd2cbd4fcfd6bfe96e5c4"

COMMON = {
    "aid": "0123456789abcdef0123456789abcdef",
    "cid": "fedcba9876543210fedcba9876543210",
    "id": "evt-0001",
    "aip": "198.51.100.7",
    "timestamp": "1718000000123",
    "event_platform": "Win",
    "ConfigBuild": "1007.3.0016606.1",
}


def ev(name: str, extra: dict, *, common: bool = True, msg: str | None = None) -> dict:
    d = {"event_simpleName": name}
    if common:
        d.update(COMMON)
        d["name"] = msg or f"{name}V2"
    d.update(extra)
    return d


FIXTURES: list[dict] = [
    # process_activity (+ ParentImageFileName variant)
    ev("ProcessRollup2", {
        "ImageFileName": "\\Device\\HarddiskVolume3\\Windows\\System32\\cmd.exe",
        "CommandLine": "cmd.exe /c whoami",
        "SHA256HashData": SHA256,
        "MD5HashData": MD5,
        "RawProcessId": "4832",
        "SourceProcessId": "111",
        "ParentProcessId": "222",
        "ParentBaseFileName": "explorer.exe",
        "ParentCommandLine": "explorer.exe /start",
        "SomeUnmappedKey": "v1",
    }),
    ev("EndOfProcess", {"ImageFileName": "bash", "ParentImageFileName": "init"}),
    # network_activity IP4 + IP6 variant
    ev("NetworkConnectIP4", {
        "LocalPort": "49152",
        "RemotePort": "443",
        "RemoteAddressIP4": "203.0.113.9",
        "LocalAddressIP4": "10.0.0.5",
        "PhysicalAddress": "00-11-22-33-44-55",
        "ConnectionDirection": "0",
    }, msg="NetworkConnectIP4V10"),
    ev("NetworkConnectIP6", {
        "RemoteAddressIP6": "2001:db8::9",
        "LocalAddressIP6": "2001:db8::5",
        "ConnectionDirection": "1",
        "RemotePort": "8443",
    }, msg="NetworkConnectIP6V10"),
    # device_config_state (+ unknown platform)
    ev("SensorHeartbeat", {"CpuUsage": "12"}),
    {**ev("AgentConnect", {}), "event_platform": "Sol"},
    # http_activity: HttpRequest (method decode), HttpResponse (status
    # Override), TlsClientHello (ja3)
    ev("HttpRequest", {
        "HttpMethod": "3",
        "HttpHost": "internal.example",
        "HttpPath": "/login",
        "RemoteAddressIP4": "203.0.113.20",
        "RemotePort": "80",
        "LocalPort": "50001",
        "ImageFileName": "curl",
        "CommandLine": "curl http://internal.example/login",
        "DomainName": "internal.example",
    }),
    ev("HttpResponse", {"HttpStatus": "404"}),
    ev("HttpResponse", {"HttpStatus": "204"}),
    ev("TlsClientHello", {"Ja3Hash": JA3, "TlsVersion": "2"}),
    # extapi (full + minimal)
    {
        "event_type": "Event_ExternalApiEvent",
        "UTCTimestamp": "1718000000",
        "ExternalApiType": "Event_AuthActivityAuditEvent",
        "UserIp": "192.0.2.77",
        "UserId": "user@example.com",
        "cid": COMMON["cid"],
        "AgentIdString": "agent-1",
        "CustomerIdString": "cust-1",
        "AuditKeyValues": [
            {"Key": "request_method", "ValueString": "Get"},
            {"Key": "status_code", "ValueString": "200"},
            {"Key": "user_agent", "ValueString": "falcon-cli/1.0"},
            {"Key": "request_uri_length", "ValueString": "42"},
            {"Key": "trace_id", "ValueString": "trace-1"},
            {"Key": "request_path", "ValueString": "/api/v1"},
            {"Key": "request_accept", "ValueString": "application/json"},
            {"Key": "request_content_type", "ValueString": "application/json"},
            {"Key": "APIClientID", "ValueString": "client-9"},
        ],
    },
    {
        "event_type": "Event_ExternalApiEvent",
        "UTCTimestamp": "1718000060",
        "ExternalApiType": "Event_Other",
        "UserIp": "",
        "UserId": "",
        "cid": "",
        "AgentIdString": "",
        "CustomerIdString": "",
        "AuditKeyValues": [{"Key": "status_code", "ValueString": "503"}],
    },
    # file_system_activity (+ script/content variant + folder)
    ev("NewScriptWritten", {
        "TargetFileName": "/tmp/a.sh",
        "FileIdentifier": "f-1",
        "UserName": "alice",
        "SHA256HashData": SHA256,
    }),
    ev("NewScriptWritten", {
        "ScriptContentName": "b.ps1",
        "ContentSHA256HashData": SHA256,
        "TargetDirectoryName": "C:\\scripts",
    }),
    # dns_activity
    ev("DnsRequest", {"DomainName": "example.internal", "ContextBaseFileName": "chrome.exe"}),
    # authentication
    ev("UserLogon", {
        "UserName": "alice",
        "UserPrincipal": "alice@corp",
        "UserSid": "S-1-5-21-1",
        "AuthenticationId": "999",
        "AuthenticationUuid": "uuid-1",
        "AuthenticationIdMac": "mac-1",
        "LogonType": "10",
        "RawProcessId": "712",
        "UserIsAdmin": "1",
    }),
    # file_hosting_activity (+ DownloadPath variant)
    ev("LfoUploadStart", {
        "SourceFileName": "dump.bin",
        "SHA256HashData": SHA256,
        "DownloadServer": "files.example",
        "DownloadPort": "443",
    }),
    ev("LFODownloadConfirmation", {"DownloadPath": "/dl/dump.bin", "ContentSHA256HashData": SHA256}),
    # module_activity (+ IOServicePath variant)
    ev("KextLoad", {
        "BundleID": "com.example.kext",
        "ImageFileName": "example.kext",
        "SHA256HashData": SHA256,
        "SHA1HashData": SHA1,
        "MD5HashData": MD5,
    }),
    ev("IOServiceRegister", {"IOServicePath": "IOService:/root/disk"}),
    # application_lifecycle
    ev("InstalledApplication", {
        "UpdateFlag": "3",
        "AppName": "Editor",
        "AppSource": "store",
        "AppVendor": "ExampleCorp",
        "AppVersion": "2.1",
    }),
    ev("InstalledApplication", {"UpdateFlag": "9"}),
    # operating_system_patch_state (single + multi KB)
    ev("InstalledUpdates", {"Status": "0", "InstalledUpdateIds": "KB5000001;KB5000002;KB5000003"}),
    ev("InstalledUpdates", {"Status": "7", "InstalledUpdateIds": "KB5000009"}),
    # detection_finding
    ev("ScriptControlDetectInfo", {
        "ImageFileName": "powershell.exe",
        "CommandLine": "powershell -enc AAA",
        "ContentSHA256HashData": SHA256,
        "ContextProcessId": "ctx-1",
        "ParentImageFileName": "cmd.exe",
        "GrandparentImageFileName": "explorer.exe",
        "GrandparentCommandLine": "explorer.exe /gp",
    }),
    # edge cases
    {"no_discriminator": "true", "timestamp": "1718000000"},
    {"event_simpleName": "SomeFutureEvent", "timestamp": "1718000000"},
    {"EventType": "SensorHeartbeat", "aid": "alt-disc", "timestamp": "1718000002"},
    ev("SensorHeartbeat", {"timestamp": "1718000000"}),          # seconds
    {k: v for k, v in ev("SensorHeartbeat", {}).items() if k != "timestamp"},  # missing ts
    ev("SensorHeartbeat", {"aip": "", "cid": ""}),               # empty strings
]

CORRUPT_LINE = "{not json at all"

