#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every <sfDir>/*.parquet as a
DuckDB view named after the file, runs each oracle SQL, and compares against
the Spark result parquet at <verifyOutDir>/<name>/ — column names (sorted),
dtypes (loosely), row count, and a hash of values with columns sorted by name
and rows sorted canonically.
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for hashing: floats rounded via repr of float64
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def table_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == "f":
            vals = ["%.9g" % v if pd.notna(v) else "NaN" for v in s]
        elif s.dtype.kind == "M":
            vals = [str(v) for v in s]
        else:
            vals = [repr(v) for v in s.astype(object)]
        h.update(("\x1f".join(vals) + "\x1e" + col).encode())
    return h.hexdigest()[:16]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    results = {}
    spark_dirs = [d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d))]
    for name in sorted(set(spark_dirs) | set(oracle)):
        spath = os.path.join(out_dir, name)
        if not os.path.isdir(spath):
            results[name] = "MISSING_SPARK_RESULT"
            continue
        sdf = pq.read_table(spath).to_pandas()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(sdf)}"
            continue
        try:
            oarrow = con.execute(oracle[name]).arrow()
            odf = oarrow.to_pandas()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        # ARROW-TYPE comparison: the driver hashes values WITH their arrow
        # type, so e.g. DuckDB HUGEINT (decimal128) vs Spark BIGINT fails
        # there even when the value-reprs below match (the r02 a6 bug —
        # repr(26285) == repr(Decimal(26285)) hid it locally).
        stypes = {f.name: str(f.type) for f in pq.read_table(spath).schema}
        otypes = {f.name: str(f.type) for f in oarrow.schema}
        type_diffs = [
            f"{c}: spark={stypes[c]} oracle={otypes[c]}"
            for c in sorted(set(stypes) & set(otypes))
            # ns-vs-us timestamps and large_string are arrow-transport
            # artifacts, not engine type divergence
            if stypes[c].replace("[ns]", "[us]") !=
               otypes[c].replace("[ns]", "[us]").replace("large_string", "string")
        ]
        s, o = canon(sdf), canon(odf)
        problems = []
        if type_diffs:
            problems.append("ARROW_TYPE_DIFF " + "; ".join(type_diffs))
        if list(s.columns) != list(o.columns):
            problems.append(f"cols spark={list(s.columns)} oracle={list(o.columns)}")
        if len(s) != len(o):
            problems.append(f"rows spark={len(s)} oracle={len(o)}")
        if not problems:
            hs, ho = table_hash(s), table_hash(o)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
                # show first differing rows for debugging
                for i in range(min(len(s), 5000)):
                    rs, ro = s.iloc[i].tolist(), o.iloc[i].tolist()
                    if repr(rs) != repr(ro):
                        problems.append(f"first diff row {i}: spark={rs} oracle={ro}")
                        break
        results[name] = "OK" if not problems else "MISMATCH: " + "; ".join(problems)

    ok = sum(1 for v in results.values() if v == "OK")
    rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        flag = "✓" if v == "OK" else ("·" if v.startswith("ROWS_ONLY") else "✗")
        print(f"{flag} {k}: {v}")
    print(f"\n{ok} OK, {rows_only} rows-only, "
          f"{len(results) - ok - rows_only} failing, of {len(results)}")
    return 0 if ok + rows_only == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
