"""Sources & sinks: testdata loaders, deterministic fixtures, catalog/deploy.

Reference analog: imposm.parser (PBF/XML scan) + imposm/db/postgis.py (sink).
Here scans are Spark parquet/Iceberg reads; the deterministic fixture generators
stand in for checked-in OSM test files (SURVEY.md §5.1).
"""
