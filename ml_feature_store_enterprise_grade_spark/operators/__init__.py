"""Engine operators, each registered as an oracle-checkable query."""
