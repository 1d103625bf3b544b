#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [q1,q2,...]

Runs each oracle_sql.json entry in DuckDB over the sfDir parquet tables,
loads the matching Spark parquet dump, sorts columns by name and rows by
all columns, and compares values exactly. Reports per-query
rows/schema/values status plus max float deviation so rounding patterns
can be tuned before the driver ever runs.

Type-strict (round 9): before comparing values, the DuckDB result's
Arrow schema is compared column-by-column against the Spark parquet
Arrow schema. This catches the class of divergence that burned q72 in
round 8 — DuckDB sum(BIGINT) returns HUGEINT (arrow decimal128) while
Spark emits BIGINT (int64); Python-normalized values are identical, so
a value-only compare is blind to it, but the driver's type-sensitive
hash is not. A small equivalence map covers representation-only
differences that the driver's hash demonstrably tolerates (string vs
large_string).

Sortability-strict (round 10): the driver sorts result frames with
pandas sort_values, which raises "unhashable type: numpy.ndarray" on
any list/struct/map column — four round-9 rows (q111/q127/q172/q241)
were value-exact here yet red at the driver for exactly that. This
replica now rejects ANY non-scalar result column (on either side) with
a loud FAIL before comparing values, so a query that would crash the
driver's checker can never PASS locally.

Tooling only (duckdb/pyarrow are driver-side utilities, not library deps).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(t):
    """Collapse an Arrow type to the class the driver's hash sees.

    string/large_string (and their list variants) are the same wire
    value; everything else compares by exact Arrow type string, so
    int64 vs decimal128(38,0) (the q72 HUGEINT burn) is a mismatch.
    """
    s = str(t)
    return s.replace("large_string", "string")


def schema_mismatches(oracle_schema, spark_schema):
    """Per-column type diffs between oracle and Spark Arrow schemas."""
    stypes = {f.name: f.type for f in spark_schema}
    diffs = []
    for f in oracle_schema:
        st = stypes.get(f.name)
        if st is None:
            continue  # column-set diff is reported separately
        if type_class(f.type) != type_class(st):
            diffs.append((f.name, str(f.type), str(st)))
    return diffs


def nonscalar_columns(schema):
    """Columns the driver's pandas sorter cannot handle (lists, structs,
    maps — anything nested). Mirrors pandas sort_values' failure mode."""
    import pyarrow.types as pt
    return [f.name for f in schema if pt.is_nested(f.type)]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            otab = con.execute(sql).fetch_arrow_table()
            ocols = otab.column_names
            orows = [tuple(r.values()) for r in otab.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        try:
            stab = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).fetch_arrow_table()
            scols = stab.column_names
            srows = [tuple(r.values()) for r in stab.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            failures += 1
            continue
        ns = sorted(set(nonscalar_columns(otab.schema)) |
                    set(nonscalar_columns(stab.schema)))
        if ns:
            print(f"FAIL {name}: NON-SCALAR result columns {ns} — the "
                  f"driver's pandas sort_values crashes on these; emit "
                  f"array_join/to_json strings or explode to rows")
            failures += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns differ: oracle={sorted(ocols)} "
                  f"spark={sorted(scols)}")
            failures += 1
            continue
        tdiffs = schema_mismatches(otab.schema, stab.schema)
        if tdiffs:
            det = "; ".join(f"{c}: oracle={ot} spark={st}"
                            for c, ot, st in tdiffs)
            print(f"FAIL {name}: result TYPES differ ({det})")
            failures += 1
            continue
        operm = [ocols.index(c) for c in sorted(ocols)]
        sperm = [scols.index(c) for c in sorted(scols)]
        o = sorted([tuple(norm(r[i]) for i in operm) for r in orows],
                   key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
        s = sorted([tuple(norm(r[i]) for i in sperm) for r in srows],
                   key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
        if len(o) != len(s):
            print(f"FAIL {name}: row count oracle={len(o)} spark={len(s)}")
            failures += 1
            continue
        bad = None
        max_float_dev = 0.0
        n_diff = 0
        for ro, rs in zip(o, s):
            if ro == rs:
                continue
            for vo, vs in zip(ro, rs):
                if vo == vs:
                    continue
                if isinstance(vo, float) and isinstance(vs, float):
                    max_float_dev = max(max_float_dev, abs(vo - vs))
                n_diff += 1
                if bad is None:
                    bad = (ro, rs)
        if bad is None:
            print(f"PASS {name}: {len(s)} rows")
        else:
            print(f"FAIL {name}: {n_diff} differing values over {len(s)} rows; "
                  f"max_float_dev={max_float_dev:.3e}")
            print(f"  first diff oracle={bad[0]}")
            print(f"             spark ={bad[1]}")
            failures += 1
    print(f"== {len(oracles) - failures}/{len(oracles)} queries match ==")
    return 1 if failures else 0


if __name__ == "__main__":
    # optional 3rd arg: comma-separated query-name filter (local
    # iteration on a partial Verify dump — the driver runs the full set).
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
