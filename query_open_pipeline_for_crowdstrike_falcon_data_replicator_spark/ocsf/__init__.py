from .event_mapping import CLASS_EVENTS, EVENT_FIELDS, EVENT_ROWS  # noqa: F401
from .schemas import OCSF_SCHEMAS, TABLE_KEYS, schema_for  # noqa: F401
