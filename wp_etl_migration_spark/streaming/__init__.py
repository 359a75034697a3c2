"""Structured Streaming operators.

The reference has **no** streaming surface (SURVEY §2.9 — its paginated
RSS poll and generator pull are incremental batch). These modules are the
engine's forward-looking streaming layer: the batch operators' semantics
re-expressed over unbounded input with watermarks and managed state.
"""
