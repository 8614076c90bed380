"""Relational (pure Spark SQL / Catalyst) implementations of the engine's
query semantics over raw document tables — the oracle-checkable path."""
