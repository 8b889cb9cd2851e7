"""DataFrame→DataFrame operators (pure functions; no I/O side effects)."""
