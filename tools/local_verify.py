#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_verify.py <outDir> [sfDir]

Expects <outDir> to contain per-query parquet dirs + oracle_sql.json, as
written by `sbt "runMain graft.Verify <sfDir> <outDir>"`. Registers every
/root/testdata table as a DuckDB view, runs each oracle SQL, and compares
against the Spark parquet output: column names (sorted), row count, and
values (columns sorted by name; rows compared as sorted multisets).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # nullable BIGINT: pandas upcasts int64-with-NULLs to float64 and
        # would stringify 40 as '40.0' while the driver's arrow path keeps
        # integers. Integral-valued float64 columns containing NaN are
        # restored to nullable Int64 so both gates serialize '40'.
        if str(df[c].dtype) == "float64" and df[c].isna().any():
            notna = df[c].dropna()
            if len(notna) and (notna % 1 == 0).all() \
                    and notna.abs().max() < 2 ** 62:
                df[c] = df[c].astype("Int64")
        # duckdb returns decimal.Decimal objects; normalize to str
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if v is not None and not isinstance(v, (str, bytes, bool)) else v)
    return df


def serialize(df: pd.DataFrame) -> list:
    """Canonical per-row string tuples, dtype-sensitive like the driver's
    hash: floats keep their '.0', ints don't, NULL becomes None while a
    genuine float NaN serializes as the DISTINCT string 'NaN' (the
    driver's hash distinguishes them; a zero-vector cosine must not
    compare equal to a NULL)."""
    rows = []
    for tup in df.itertuples(index=False, name=None):
        out = []
        for v in tup:
            if v is None or v is pd.NaT or v is pd.NA:
                out.append(None)
            elif isinstance(v, float) and v != v:
                out.append("NaN")
            else:
                out.append(str(v))
        rows.append(tuple(out))
    return rows


def sort_key(row):
    # total order with NULLs first (None is not comparable to str in py3)
    return tuple((0, "") if v is None else (1, v) for v in row)


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}")
            continue
        pq = f"{out_dir}/{name}"
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output at {pq}")
            n_fail += 1
            continue
        try:
            files = glob.glob(f"{pq}/*.parquet")
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
                if files else pd.DataFrame()
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        dt = [(c, str(spark_df[c].dtype) if c in spark_df else "?",
               str(duck_df[c].dtype) if c in duck_df else "?")
              for c in spark_df.columns
              if c in duck_df.columns and str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        for c, a, b in dt:
            print(f"  WARN {name}.{c}: dtype spark={a} duck={b}")
        # Driver-faithful compare: the driver hashes SERIALIZED values, so
        # int64 40 vs float64 40.0 must FAIL here too (kq19 slipped through
        # r4's check_dtype=False compare). Stringify every cell, then compare
        # rows as sorted multisets.
        s2 = serialize(s)
        d2 = serialize(d)
        s2.sort(key=sort_key)
        d2.sort(key=sort_key)
        if s2 == d2:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        elif len(s2) != len(d2):
            # defensive (row counts are compared above): never index into
            # an empty list, and report the extra row rather than a
            # misleading "first diff" that is actually an equal prefix row
            print(f"FAIL {name}: serialized row counts differ "
                  f"spark={len(s2)} duck={len(d2)}")
            longer, side = (s2, "spark") if len(s2) > len(d2) else (d2, "duck")
            print(f"  first extra {side} row: {longer[min(len(s2), len(d2))]}")
            n_fail += 1
        else:
            bad = next(i for i, (a, b) in enumerate(zip(s2, d2)) if a != b)
            print(f"FAIL {name}: serialized-value mismatch")
            print(f"  first diff row {bad}:\n  spark: {s2[bad]}\n  duck : {d2[bad]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
