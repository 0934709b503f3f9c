# Driver-style correctness cross-check (local): for every oracled query,
# run the DuckDB SQL on the sf tables and compare against the Spark parquet
# output in outDir — schema (sorted col names), row count, and value hash
# (rows sorted, columns sorted by name).
import duckdb, json, glob, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"

con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = t.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

sql = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for k in sorted(sql):
    q = sql[k]
    try:
        oracle = con.execute(q).fetch_df()
        spark = con.execute(
            f"SELECT * FROM read_parquet('{out}/{k}/*.parquet')").fetch_df()
        ocols, scols = sorted(oracle.columns), sorted(spark.columns)
        schema_ok = ocols == scols
        rows_ok = len(oracle) == len(spark)
        hash_ok = False
        if schema_ok and rows_ok:
            o = oracle[ocols].sort_values(ocols).reset_index(drop=True)
            s = spark[scols].sort_values(scols).reset_index(drop=True)
            hash_ok = all(
                o[c].astype(str).tolist() == s[c].astype(str).tolist()
                for c in ocols)
        status = "PASS" if (schema_ok and rows_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{k}: {status} schema={schema_ok} rows={rows_ok} "
                  f"({len(oracle)} vs {len(spark)}) hash={hash_ok}")
            if not schema_ok:
                print("  oracle cols:", ocols, " spark cols:", scols)
            elif rows_ok:
                for c in ocols:
                    ol = o[c].astype(str).tolist()
                    sl = s[c].astype(str).tolist()
                    if ol != sl:
                        diffs = [(i, ol[i], sl[i])
                                 for i in range(len(ol)) if ol[i] != sl[i]][:3]
                        print(f"  col {c} first diffs:", diffs)
        else:
            print(f"{k}: PASS ({len(oracle)} rows)")
    except Exception as e:
        fails += 1
        print(f"{k}: ERROR {type(e).__name__}: {str(e)[:300]}")
print(f"\n{len(sql) - fails}/{len(sql)} oracled queries pass")
sys.exit(1 if fails else 0)
