"""spark-submit entry point: the M1 spine as a standalone cluster job.

north-rule deployment shape:
    spark-submit --master <cluster> --py-files imposm2_spark.zip \
        scripts/submit_spine.py <web_table_or_path> [replication]

The job must import imposm2_spark ONLY from --py-files (no repo on
sys.path), proving the package is self-contained. Prints one JSON line with
the tile count and wall time; exit 0 on success.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    replication = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    spark = SparkSession.builder.appName("imposm2_spark_spine").getOrCreate()

    from imposm2_spark.plans.pipeline import spine
    from imposm2_spark.sources import fixtures, testdata
    from imposm2_spark.sources.webtable import WEB_COLUMNS, validate_web_schema

    docs = spark.read.parquet(ref)
    if set(WEB_COLUMNS) <= set(docs.columns):
        web = validate_web_schema(docs)
    else:  # raw documents table -> synthesize the web-page shape
        web = testdata.synth_documents_web(
            docs, replication=replication if replication > 1 else None, spark=spark
        )
    polygons = fixtures.world_octants_df(spark, cell_level=4).unionByName(
        fixtures.polygons_admin_df(spark, cell_level=4)
    )
    t0 = time.perf_counter()
    n_tiles = spine(web, polygons, zooms=(2, 5), cell_level=4).count()
    print(json.dumps({"n_tiles": n_tiles, "wall_sec": round(time.perf_counter() - t0, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
