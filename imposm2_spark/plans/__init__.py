"""End-to-end plans: the imposm2 pipeline stages composed as lazy DataFrame DAGs.

Reference analog: imposm/writer.py::ImposmWriter stage sequencing + imposm/app.py
CLI entry points — here each stage is a function returning a DataFrame, and the
sequencing is plain dataflow dependency (SURVEY.md §3.2).
"""
