"""Engine scalar-function library (JVM-side, oracle-portable)."""

from .scalar import (  # noqa: F401
    normalize_text,
    portable_hash64,
    safe_div,
    NORMALIZE_TEXT_SQL,
    PORTABLE_HASH64_SQL,
)
