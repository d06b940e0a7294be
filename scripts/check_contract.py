"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row-count + column names + order-insensitive values."""
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    # Type-distinct: int 0 and float 0.0 must NOT collapse to the same key.
    # The driver's gate hashes typed representations, so a DuckDB HUGEINT
    # surfacing as float64 vs Spark BIGINT is a real mismatch (r1 sessionize).
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v:.12g}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(norm_cell(x) for x in v.tolist()) + "]"
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:
        pass
    return repr(v)


def dtype_kinds(pdf):
    # i/u → int, f → float, b → bool, else object; NULL-bearing int columns
    # become float64 in BOTH engines' pandas paths, so kinds stay comparable.
    out = {}
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        out[c] = {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, "obj")
    return out


def frame_key(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def main():
    only = sys.argv[1:] or None
    import __spark_entry__ as entrymod
    from newsspark.session import get_spark

    spark = get_spark(app_name="contract-check", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    t_start = time.monotonic()
    # per-entry wall times (spark + duck) so gate-trim targets are
    # data-driven as the query count grows (VERDICT r4 "Next round" #8)
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {str(exc)[:300]}")
            n_fail += 1
            continue
        spark_ms = (time.monotonic() - t0) * 1000
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(spdf)} rows, "
                  f"cols={list(spdf.columns)})  [{spark_ms:.0f}ms]")
            continue
        t1 = time.monotonic()
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {str(exc)[:300]}")
            n_fail += 1
            continue
        duck_ms = (time.monotonic() - t1) * 1000
        scols, srows = frame_key(spdf)
        ocols, orows = frame_key(opdf)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            n_fail += 1
            continue
        skinds, okinds = dtype_kinds(spdf), dtype_kinds(opdf)
        kind_bad = {c: (skinds[c], okinds[c]) for c in scols if skinds[c] != okinds[c]}
        if kind_bad:
            print(f"FAIL  {name}: dtype kinds differ (spark, duck): {kind_bad}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL  {name}: {len(bad)} value mismatches; first at {i}:")
            print("   spark:", srows[i])
            print("   duck :", orows[i])
            n_fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows match  "
                  f"[spark {spark_ms:.0f}ms, duck {duck_ms:.0f}ms]")
    total_s = time.monotonic() - t_start
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}"
          f"  (total {total_s:.1f}s)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
