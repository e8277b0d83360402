"""Dataflow operators: the SURVEY.md §2 inventory re-expressed Spark-first.

Each module documents its reference analog (imposm2 file::symbol) and the
Spark primitive it builds on. Custom work is confined to Arrow-batched kernels;
joins/aggregations/routing are plain Catalyst-optimizable DataFrame ops.
"""
