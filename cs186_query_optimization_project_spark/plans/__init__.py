"""Logical query plans: fluent builder, table stats, page-mode cost model,
System-R join-order optimizer, and reference-style explain output."""
