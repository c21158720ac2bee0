import duckdb, hashlib, sys
sys.path.insert(0, "/root/repo")
from calp_cva_tracking_pipeline_spark.catalog import relational as R

SF = "/root/testdata/sf0.1"
def sig(threads=None):
    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads={threads}")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    rows = con.execute(R.W1_SQL).fetchall()
    canon = sorted((r[0], r[1], "%.9g" % r[2], "%.9g" % r[3]) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest(), len(rows)
for i in range(4):
    print("default threads:", sig())
print("1 thread:", sig(threads=1))
