"""Standalone cross-engine checker: runs every registered query on Spark and
DuckDB at a given sf dir and diffs the results exactly like the driver does
(sorted columns, sorted rows, stringified values).  Usage:

    python tests/xcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_run(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def normalize(df):
    """pandas DataFrame -> (columns, sorted stringified rows)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        tuple(repr(v) for v in row) for row in df.itertuples(index=False)
    )
    return cols, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # data-derived oracles (e.g. emb_kmeans centroid literals) must be built
    # at the SAME scale the views point at; set before the registry import
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from flatterer_spark.registry import all_oracles, all_queries
    from flatterer_spark.session import get_spark

    spark = get_spark(app_name="xcheck")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = all_queries(), all_oracles()

    failed = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows)")
            continue
        try:
            ddf = duck_run(oracles[name], sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failed.append(name)
            continue
        scols, srows = normalize(sdf)
        dcols, drows = normalize(ddf)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} != {dcols}")
            failed.append(name)
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} != {len(drows)}")
            failed.append(name)
        elif srows != drows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  spark : {srows[bad]}")
            print(f"  duckdb: {drows[bad]}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(srows)} rows)")
    spark.stop()
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
