"""Sinks (SURVEY §2.2): file writers, ledger lineage, staged upsert chain."""
