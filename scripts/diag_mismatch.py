"""Diff Spark vs DuckDB oracle rows for named registry queries at sf0.01."""
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from imposm2_spark.plans import registry
from imposm2_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(names):
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, os_ = registry.queries(), registry.oracle_sql()
    for name in names:
        print(f"=== {name} ===")
        sp = canon(qs[name](spark, SF_DIR).toPandas())
        du = canon(con.execute(os_[name]).df())
        print("spark cols:", list(sp.columns), sp.dtypes.to_dict())
        print("duck  cols:", list(du.columns), du.dtypes.to_dict())
        if len(sp) != len(du):
            print(f"ROWS differ: spark={len(sp)} duck={len(du)}")
            continue
        for c in sp.columns:
            a, b = sp[c], du[c]
            try:
                neq = ~(a.astype(str) == b.astype(str))
            except Exception as e:
                print(c, "compare err", e)
                continue
            if neq.any():
                idx = neq[neq].index[:10]
                print(f"col {c}: {neq.sum()} diffs")
                for i in idx:
                    print("  row", i, "spark=", repr(a[i]), "duck=", repr(b[i]),
                          "| key:", {k: sp[k][i] for k in sp.columns[:3]})
            else:
                print(f"col {c}: OK")


if __name__ == "__main__":
    main(sys.argv[1:] or ["events_time_json_family", "events_window_family", "curate_corpus"])
