"""North-rule enforcement (SURVEY.md §2.10): NO per-row Python UDFs anywhere.

Engine Python boundaries must be Arrow-batched (@pandas_udf, applyInPandas,
mapInPandas). A row-at-a-time `F.udf(...)` / `@udf` in the engine is a
10-100x regression at 100 TB — this test greps the package source so one
can't slip in silently.
"""

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "imposm2_spark"

ROW_UDF_RE = re.compile(r"(?<![\w.])(?:F\.)?udf\s*\(|@udf\b")


def test_no_row_at_a_time_udfs():
    offenders = []
    for py in PKG.rglob("*.py"):
        src = py.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            code = line.split("#", 1)[0]
            if ROW_UDF_RE.search(code) and "pandas_udf" not in code:
                offenders.append(f"{py.relative_to(PKG.parent)}:{i}: {line.strip()}")
    assert not offenders, "row-at-a-time Python UDFs found:\n" + "\n".join(offenders)


def test_python_boundaries_are_arrow_batched():
    # every Python-boundary construct used must be one of the Arrow forms
    allowed = ("pandas_udf", "applyInPandas", "mapInPandas")
    found = set()
    for py in PKG.rglob("*.py"):
        src = py.read_text()
        for form in allowed:
            if form in src:
                found.add(form)
    assert found >= {"pandas_udf", "applyInPandas", "mapInPandas"}
