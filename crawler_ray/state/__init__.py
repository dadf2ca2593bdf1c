"""Shared mutable state as Ray actors: sharded URL-seen membership,
per-host politeness budgets, metrics counters.  Each actor class has a
plain-Python core so the serial oracle and unit tests exercise identical
logic without a Ray session."""
