from .builders import nonempty  # noqa: F401
from .timeparse import TIMESTAMP_SENTINEL, fdr_timestamp  # noqa: F401
