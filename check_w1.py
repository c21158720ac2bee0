import sys
from calp_cva_tracking_pipeline_spark.session import get_spark
from calp_cva_tracking_pipeline_spark.catalog import relational as R

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
import hashlib
def sig():
    rows = R.w1_cumprod(spark, SF).collect()
    canon = sorted(
        (r["l_orderkey"], r["l_linenumber"], "%.9g" % r["cum_growth"], "%.9g" % r["rev_cum_growth"])
        for r in rows
    )
    h = hashlib.md5(repr(canon).encode()).hexdigest()
    return h, len(rows)
for i in range(4):
    print(sig())
