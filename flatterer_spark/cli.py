"""CLI entry point mirroring the reference's console script
(`/root/reference/flatterer/__init__.py:206-361`): same option names, argparse
instead of click (no extra dependency).

    python -m flatterer_spark.cli INPUT [INPUT ...] OUTPUT_DIR [options]
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="flatterer-spark",
        description="Flatten JSON into linked relational tables on Spark.",
    )
    p.add_argument("inputs", nargs="+", help="input file(s); last arg = output dir")
    p.add_argument("--ndjson", action="store_true")
    p.add_argument("--json-stream", action="store_true", dest="json_stream")
    p.add_argument("--path", action="append", default=[], help="array key path segment")
    p.add_argument("--json-path", dest="json_path")
    p.add_argument("--main-table-name", default="main", dest="main_table_name")
    p.add_argument("--path-separator", default="_", dest="path_separator")
    p.add_argument("--table-prefix", default="", dest="table_prefix")
    p.add_argument("--inline-one-to-one", action="store_true", dest="inline_one_to_one")
    p.add_argument("--arrays-new-table", action="store_true", dest="arrays_new_table")
    p.add_argument("--pushdown", action="append", default=[])
    p.add_argument("--no-link", action="store_true", dest="no_link")
    p.add_argument("--id-prefix", default="", dest="id_prefix")
    p.add_argument("--fields", dest="fields_csv")
    p.add_argument("--only-fields", action="store_true", dest="only_fields")
    p.add_argument("--tables", dest="tables_csv")
    p.add_argument("--only-tables", action="store_true", dest="only_tables")
    p.add_argument("--schema")
    p.add_argument("--schema-titles", dest="schema_titles")
    p.add_argument("--preview", type=int, default=0)
    p.add_argument("--parquet", action="store_true")
    p.add_argument("--sqlite", action="store_true")
    p.add_argument("--sqlite-path", dest="sqlite_path")
    p.add_argument("--xlsx", action="store_true")
    p.add_argument("--sql-scripts", action="store_true", dest="sql_scripts")
    p.add_argument("--stats", action="store_true")
    p.add_argument("--force", action="store_true")
    p.add_argument("--evolve", action="store_true")
    p.add_argument("--drop", action="store_true")
    p.add_argument("--truncate", action="store_true")
    p.add_argument("--threads", type=int, default=0, help="accepted; Spark owns parallelism")
    p.add_argument("--ordinals", choices=["strict", "partition"], default="strict")
    p.add_argument("--postgres", help="connection string, or env / env=VAR")
    p.add_argument("--postgres-schema", dest="postgres_schema")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if len(args.inputs) < 2:
        print("need INPUT... OUTPUT_DIR", file=sys.stderr)
        return 2
    *inputs, output_dir = args.inputs
    source = inputs[0] if len(inputs) == 1 else inputs

    from flatterer_spark.flatten import flatten
    from flatterer_spark.logutil import setup_logging

    setup_logging("info")  # CLI default info, like the reference console script

    kw = {
        k: getattr(args, k)
        for k in (
            "ndjson json_stream json_path main_table_name path_separator "
            "table_prefix inline_one_to_one arrays_new_table no_link id_prefix "
            "fields_csv only_fields tables_csv only_tables schema schema_titles "
            "preview parquet sqlite sqlite_path xlsx sql_scripts stats force "
            "evolve drop truncate threads ordinals postgres postgres_schema"
        ).split()
    }
    kw["path"] = tuple(args.path)
    kw["pushdown"] = tuple(args.pushdown)
    flatten(source, output_dir, **kw)
    print(f"wrote {output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
