"""Cross-engine type parity audit.

The driver hashes Spark and DuckDB results after sorting columns by name; a
column whose *type* differs between engines (DuckDB ``sum(INTEGER)`` ->
HUGEINT vs Spark BIGINT, ``//`` division, DECIMAL vs DOUBLE) can render
differently in the driver's canonicalizer even when values are equal.  This
tool runs every oracle SQL in DuckDB (LIMIT 0) and every Spark query
(schema only) and reports per-column type pairs, flagging:

- any DuckDB HUGEINT / INT128 / DECIMAL output column
- any column where the engines' type families (int / float / date / ts /
  str / bool / list) disagree

Usage:  python tools/typeaudit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "int128", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int", "UHUGEINT": "int128",
    "FLOAT": "float", "DOUBLE": "float",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "VARCHAR": "str", "BOOLEAN": "bool",
}


def duck_family(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith(("LIST", "ARRAY")) or t.endswith("[]"):
        return "list"
    if t.startswith("STRUCT"):
        return "struct"
    return FAMILY.get(t, t.lower())


def spark_family(t: str) -> str:
    t = t.lower()
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t.startswith("array"):
        return "list"
    if t.startswith("struct"):
        return "struct"
    if t.startswith("decimal"):
        return "decimal"
    return t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from basin_climbing_data_pipeline_spark.registry import REGISTRY
    from basin_climbing_data_pipeline_spark.session import get_spark

    spark = get_spark("typeaudit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        if sql is None:
            continue
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            bad += 1
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            bad += 1
            continue

        issues = []
        if sorted(duck_types) != sorted(spark_types):
            issues.append(
                f"column-set mismatch spark={sorted(spark_types)} duck={sorted(duck_types)}"
            )
        else:
            for col, dt_ in duck_types.items():
                df_, sf_ = duck_family(dt_), spark_family(spark_types[col])
                if df_ in ("int128", "decimal"):
                    issues.append(f"{col}: duck {dt_} (canon-unsafe) vs spark {spark_types[col]}")
                elif df_ != sf_:
                    issues.append(f"{col}: duck {dt_} vs spark {spark_types[col]}")
        if issues:
            bad += 1
            print(f"{name}:")
            for i in issues:
                print(f"  - {i}")
    print(f"\n{'FAIL' if bad else 'OK'}: {bad} queries with type-parity issues")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
