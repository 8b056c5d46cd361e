"""Engine scalar-function library (JVM-side, oracle-portable)."""

from .scalar import (  # noqa: F401
    money,
    normalize_text,
    portable_hash64,
    safe_div,
    MONEY_SQL,
    NORMALIZE_TEXT_SQL,
    PORTABLE_HASH64_SQL,
)
