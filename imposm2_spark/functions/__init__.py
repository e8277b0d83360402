"""Scalar-function surface: column expressions + vectorized pandas UDFs.

Reference analog: the FieldType classes of imposm/mapping.py (SURVEY.md §2.8)
plus the graft's web-document functions (HTML->text, geotag, cell encode).
Everything here is either a pure Column expression (JVM-side, codegen'd) or an
Arrow-batched pandas UDF — never a row-at-a-time Python UDF.
"""
