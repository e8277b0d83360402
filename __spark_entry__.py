"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship M1 spine on sf0.001: documents -> synthesize web-page
                 shape -> HTML extract -> geotag -> PIP join -> tile counts.
queries()      — one entry per implemented SURVEY.md §2 operator.
oracle_sql()   — DuckDB-runnable ANSI SQL twins (identical column aliases).

Implementation lives in imposm2_spark.plans.registry; this façade stays thin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from imposm2_spark.plans.pipeline import spine
    from imposm2_spark.sources import fixtures, testdata

    docs = testdata.load(spark, "/root/testdata/sf0.001", "documents")
    docs_web = testdata.synth_documents_web(docs)
    polygons = fixtures.world_octants_df(spark, cell_level=4).unionByName(
        fixtures.polygons_admin_df(spark, cell_level=4)
    )
    return spine(docs_web, polygons, zooms=(2, 5), cell_level=4)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from imposm2_spark.plans import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from imposm2_spark.plans import registry

    return registry.oracle_sql()
