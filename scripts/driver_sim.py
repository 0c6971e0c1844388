"""Simulate the driver harness: import __spark_entry__ as the driver would,
smoke entry(), then run the sf0.01 oracle gate."""
import sys, time, math, datetime, decimal

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

# driver-style bare session (no engine tuning — entry() must cope)
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as ep

# 1. entry() smoke — driver checks rows >= 0 and stable schema
df = ep.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0
df2 = ep.entry(spark)
assert [f.name for f in df2.schema.fields] == [f.name for f in df.schema.fields], "schema unstable"
print("entry() schema stable across calls")

# 2. queries() vs oracle_sql() at sf0.01 — the actual gate tier
SF = "/root/testdata/sf0.01"
qs = ep.queries()
os_ = ep.oracle_sql()
print(f"queries: {len(qs)}, oracles: {len(os_)}")
missing = set(os_) - set(qs)
assert not missing, f"oracle without query: {missing}"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(v):
    if v is None: return "\0"
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        if math.isinf(v): return "inf" if v > 0 else "-inf"
        return repr(v)
    if isinstance(v, decimal.Decimal): return f"dec:{v}"  # exact at declared scale — no float collapse (r12 q121)
    if isinstance(v, datetime.datetime):
        # render tz offset when aware — naive must not equal aware (r13)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f%z" if v.tzinfo is not None
                          else "%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date): return v.isoformat()
    return repr(v)

fails = []
for name in sorted(qs):
    t0 = time.time()
    sdf = qs[name](spark, SF)
    scols = sdf.columns
    dec_cols = [f.name for f in sdf.schema.fields if type(f.dataType).__name__ == "DecimalType"]
    if dec_cols and name in os_:
        fails.append(name); print(f"FAIL {name}: DECIMAL output columns {dec_cols} breach the DOUBLE convention (r12 q121)"); continue
    srows = [tuple(r) for r in sdf.collect()]
    if name not in os_:
        print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        continue
    res = con.execute(os_[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    if sorted(scols) != sorted(dcols):
        fails.append(name); print(f"FAIL {name}: cols {sorted(scols)} vs {sorted(dcols)}"); continue
    s = sorted(tuple(canon(r[i]) for i in so) for r in srows)
    d = sorted(tuple(canon(r[i]) for i in do) for r in drows)
    if s != d:
        nbad = sum(1 for a, b in zip(s, d) if a != b) + abs(len(s) - len(d))
        first = next(((a, b) for a, b in zip(s, d) if a != b), (s[:1], d[:1]))
        fails.append(name)
        print(f"FAIL {name}: {nbad} rows differ ({len(s)} vs {len(d)}); first: {first}")
    else:
        print(f"ok   {name}: {len(s)} rows match ({time.time()-t0:.1f}s)")

print(f"\nGATE: {len(qs)-len(fails)}/{len(qs)} pass at sf0.01")
sys.exit(1 if fails else 0)
