"""Structured Streaming surfaces (the reference is batch-only; these wire
its incremental semantics to streaming sources)."""
