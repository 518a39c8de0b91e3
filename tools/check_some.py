"""Ad-hoc parity check for a subset of registered queries.

Usage: python tools/check_some.py name1 name2 ...  [SF_DIR via env CHECK_SF]
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, "/root/repo")
# executor Python workers resolve mapInPandas closure imports via
# PYTHONPATH (the driver contract __spark_entry__.py sets the same)
os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get(
    "PYTHONPATH", ""
)
import duckdb
from pyspark.sql import SparkSession

from global_superstore_data_warehouse_spark import registry

SF = os.environ.get("CHECK_SF", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def value_hash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    recs = sorted(
        json.dumps([None if v != v else v for v in row], default=str)
        for row in pdf.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(recs).encode()).hexdigest()


qs, oracles = registry.queries(), registry.oracle_sql()
names = sys.argv[1:] or list(qs)
fails = 0
for name in names:
    fn = qs[name]
    spdf = fn(spark, SF).toPandas()
    o = oracles.get(name)
    if o is None:
        print(f"{name}: rows-only ({len(spdf)})")
        continue
    opdf = con.sql(o).df()
    ok = (
        len(spdf) == len(opdf)
        and sorted(spdf.columns) == sorted(opdf.columns)
        and value_hash(spdf) == value_hash(opdf)
    )
    if not ok:
        fails += 1
    print(
        f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(spdf)}/{len(opdf)} "
        f"cols={sorted(spdf.columns) == sorted(opdf.columns)} "
        f"hash={value_hash(spdf) == value_hash(opdf)}"
    )
print("FAILS:", fails)
spark.stop()
sys.exit(1 if fails else 0)
