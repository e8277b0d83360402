"""S6: cache merge — combine multiple extract reads, last-write-wins per id.

Reference analog: imposm2's cache merge of several `--read` runs (SURVEY.md S6)
where later extracts overwrite earlier elements by osm_id. Spark expression:
unionByName + row_number over file ordinal desc — one shuffle, no KV store.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

ORD_COL = "file_ord"


def merge_extracts(extracts: list[DataFrame], key: str, ord_col: str = ORD_COL) -> DataFrame:
    """Union extracts (each must carry `ord_col`, its read order) and keep, per
    `key`, only the row from the highest-ordinal extract (last write wins)."""
    if not extracts:
        raise ValueError("need at least one extract")
    unioned = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), extracts)
    w = W.partitionBy(key).orderBy(F.col(ord_col).desc())
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
