"""Flatten-parity queries for the driver correctness gate (SURVEY.md §2.6
Q19/Q20): run the engine's own flattening and check it against (a) a DuckDB
read_json+UNNEST reconstruction and (b) the reference's golden fields.csv
inlined as VALUES.

These take (spark, sf_dir) per the driver contract but operate on the
reference fixture document -- the flattening operator's semantics are defined
by the reference goldens, not by the synthetic star schema.
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame, SparkSession

BASIC = "/root/reference/fixtures/basic.json"
GOLDEN_FIELDS = "/root/reference/fixtures/basic_expected/fields.csv"


def q19_flatten_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Child-table rows (_link, _link_main, name) from flattening basic.json."""
    from flatterer_spark.flatten_api import flatten_dataframes

    # low_memory: the fixture is a handful of rows and q19's result stays
    # lazy past this function -- don't leave a persisted input behind
    r = flatten_dataframes(spark, BASIC, low_memory=True)
    return r.tables["platforms"].orderBy("_link")


Q19_ORACLE = f"""
WITH m AS (
  SELECT ROW_NUMBER() OVER () - 1 AS ord, platforms
  FROM read_json_auto('{BASIC}')
), e AS (
  SELECT ord, j, platforms[j] AS p
  FROM m, UNNEST(generate_series(1, len(platforms))) AS t(j)
)
SELECT CAST(ord AS VARCHAR) || '.platforms.' || CAST(j - 1 AS VARCHAR) AS _link,
       CAST(ord AS VARCHAR) AS _link_main,
       p.name AS name
FROM e ORDER BY _link
"""


def q20_flatten_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fields.csv metadata (type guesses + counts) for basic.json."""
    from flatterer_spark.flatten_api import compute_metadata, flatten_dataframes

    r = flatten_dataframes(spark, BASIC, low_memory=True)
    compute_metadata(r)
    rows = [
        (f["table_name"], f["field_name"], f["field_type"], int(f["count"]))
        for f in r.fields
    ]
    return spark.createDataFrame(
        sorted(rows), "table_name string, field_name string, field_type string, cnt long"
    )


def _golden_fields_values() -> str:
    with open(GOLDEN_FIELDS, newline="") as f:
        rows = list(csv.DictReader(f))
    vals = ", ".join(
        f"('{r['table_name']}', '{r['field_name']}', '{r['field_type']}', {r['count']})"
        for r in rows
    )
    return f"""
    SELECT * FROM (VALUES {vals})
        AS t(table_name, field_name, field_type, cnt)
    ORDER BY table_name, field_name, field_type, cnt
    """


FLATTEN_QUERIES = {
    "q19_flatten_child": q19_flatten_child,
    "q20_flatten_fields": q20_flatten_fields,
}

FLATTEN_ORACLE = {
    "q19_flatten_child": Q19_ORACLE,
    "q20_flatten_fields": _golden_fields_values(),
}
