#!/usr/bin/env python3
"""Cross-engine LSH-ladder check (ADVICE r8): asserts the Spark bucket
index and the DuckDB oracle CTE produce the EXACT same (vec_id, tbl, bk)
set on a given corpus — run at a tier where the smoothed ladder is
active (n // 2000 not a power of two, e.g. the 10x tier: k = 10,
extra = 2), because the oracle-gated tiers all sit at extra = 0 where
flat and smoothed ladders coincide.

Usage (after `sbt "runMain graft.tools.DumpBuckets <sf_dir> <out>"`):
    python3 scripts/check_ladder.py <sf_dir> <out>
"""
import sys
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ladder_check"

con = duckdb.connect()
con.sql(
    f"CREATE VIEW embeddings AS "
    f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet/**/*.parquet', "
    f"hive_partitioning=0)"
)
duck_sql = open(f"{out}/duck_buckets.sql").read()
con.sql(f"CREATE TABLE duck_b AS {duck_sql}")
con.sql(
    f"CREATE VIEW spark_b AS SELECT * FROM "
    f"read_parquet('{out}/spark_buckets.parquet/**/*.parquet')"
)

n = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]
k = n // 2000
only_spark = con.sql(
    "SELECT count(*) FROM (SELECT vec_id, tbl, bk FROM spark_b "
    "EXCEPT SELECT vec_id, tbl, bk FROM duck_b)").fetchone()[0]
only_duck = con.sql(
    "SELECT count(*) FROM (SELECT vec_id, tbl, bk FROM duck_b "
    "EXCEPT SELECT vec_id, tbl, bk FROM spark_b)").fetchone()[0]
n_spark = con.sql("SELECT count(*) FROM spark_b").fetchone()[0]
n_duck = con.sql("SELECT count(*) FROM duck_b").fetchone()[0]
# the params CTE is the first clause of the dumped SQL (which already
# starts with WITH) - close it and run it alone
params = con.sql(
    duck_sql.split("), b AS")[0] + ") SELECT bits, extra FROM params"
).fetchone()

print(f"corpus n={n} k={k} bits={params[0]} extra={params[1]}")
print(f"spark rows={n_spark} duck rows={n_duck} "
      f"only_spark={only_spark} only_duck={only_duck}")
if params[1] == 0:
    print("WARN: extra == 0 at this tier - smoothing path NOT exercised")
if only_spark == 0 and only_duck == 0 and n_spark == n_duck and n_spark > 0:
    print("PASS: bucket sets identical across engines")
else:
    print("FAIL: bucket sets differ")
    sys.exit(1)
