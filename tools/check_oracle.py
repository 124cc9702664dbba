#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each
SparkEntry.oracleSql in DuckDB over the same parquet tables and compare with
the parquet that graft.Verify dumped. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def dtype_class(s):
    """Coarse dtype class for the cross-engine compare: the driver's hash is
    dtype-sensitive (q44 was bit-identical yet red for three rounds because
    DuckDB's sum(BIGINT) widens to HUGEINT, which pandas materializes as
    object/float where Spark's BIGINT is int64). String values compare equal
    either way, so without this check the local gate is blind to it."""
    import pandas.api.types as t
    if t.is_integer_dtype(s):
        return "int"
    if t.is_float_dtype(s):
        return "float"
    if t.is_bool_dtype(s):
        return "bool"
    if t.is_datetime64_any_dtype(s):
        return "ts"
    if s.dtype == object:
        # Only flag HUGEINT widening when there is at least one actual
        # (non-None, non-bool) int: an all-None column is vacuously "all
        # int" under all(), and bool is an int subclass — either would
        # mis-report a NULL/bool column as overflow.
        vals = [x for x in s if x is not None]
        if vals and all(isinstance(x, int) and not isinstance(x, bool)
                        for x in vals):
            return "bigint-overflow"  # HUGEINT lands here
    return "other"


def cmp(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    for c in spark_df.columns:
        a, b = dtype_class(spark_df[c]), dtype_class(duck_df[c])
        if a != b:
            return (f"DTYPE col={c} spark={spark_df[c].dtype}({a}) "
                    f"duck={duck_df[c].dtype}({b}) — likely a missing "
                    f"::BIGINT on a DuckDB sum (HUGEINT widening)")
    a, b = canon(spark_df), canon(duck_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn:
                return f"NULLDIFF col={col} row={i} spark={x} duck={y}"
            if isinstance(x, float) or isinstance(y, float):
                fx, fy = float(x), float(y)
                # The driver hashes the raw double BYTES, so -0.0 != +0.0
                # there even though Python's == says they are equal. q87
                # (r11) and d98 (r13) both shipped red through this gate
                # because `float(x) != float(y)` is sign-of-zero blind.
                # repr() distinguishes '-0.0' from '0.0' and is otherwise
                # exact for finite doubles (shortest round-trip repr).
                if fx != fy or (fx == 0.0 and
                                math.copysign(1.0, fx) !=
                                math.copysign(1.0, fy)):
                    return f"VAL col={col} row={i} spark={x!r} duck={y!r}"
            elif str(x) != str(y):
                return f"VAL col={col} row={i} spark={x!r} duck={y!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated allowlist (local iteration on a
    # subset dumped with SPARK_GRAFT_VERIFY_ONLY)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        pq = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not pq:
            results[name] = "MISSING spark output"
            continue
        try:
            duck_df = con.sql(sql).fetchdf()
        except Exception as e:
            results[name] = f"DUCKDB ERROR {str(e)[:200]}"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in pq])
        results[name] = cmp(name, spark_df, duck_df)
    # queries without oracle: rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle or (only is not None and name not in only):
            continue
        pq = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in pq) if pq else 0
        results[name] = None if n > 0 else "EMPTY (rows-only check)"
    npass = sum(1 for v in results.values() if v is None)
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v is None else 'FAIL'} {name}" + (f" :: {v}" if v else ""))
    print(f"\n{npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 1)

def selftest():
    """Pins the gate's parity-critical behaviors — run after any edit to
    cmp(): `python3 tools/check_oracle.py --selftest`. The -0.0 case is
    the class that shipped red twice (q87 r11, d98 r13) because the old
    `float(x) != float(y)` compare is sign-of-zero blind while the
    driver hashes raw double bytes."""
    base = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.5]})
    cases = [
        ("identical", base, base.copy(), True),
        ("neg zero", base, pd.DataFrame({"k": [1, 2], "v": [-0.0, 1.5]}),
         False),
        ("value diff", base, pd.DataFrame({"k": [1, 2], "v": [0.0, 1.6]}),
         False),
        ("row count", base, base.head(1), False),
        ("schema", base, base.rename(columns={"v": "w"}), False),
        ("int vs float dtype", pd.DataFrame({"v": [1, 2]}),
         pd.DataFrame({"v": [1.0, 2.0]}), False),
        ("nan == nan", pd.DataFrame({"v": [float("nan")]}),
         pd.DataFrame({"v": [float("nan")]}), True),
        ("null vs value", pd.DataFrame({"v": [None]}, dtype=object),
         pd.DataFrame({"v": ["x"]}, dtype=object), False),
    ]
    bad = [n for n, a, b, want in cases
           if (cmp(n, a, b) is None) != want]
    for n in bad:
        print(f"SELFTEST FAIL: {n}")
    print(f"selftest: {len(cases) - len(bad)}/{len(cases)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
    main()
