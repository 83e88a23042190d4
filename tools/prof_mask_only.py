import sys, time; sys.path.insert(0,"/root/repo")
master = sys.argv[1]; n = int(sys.argv[2]) if len(sys.argv)>2 else 200000
from pprl_spark.spark.session import get_spark
from pprl_spark.config import *
from pprl_spark.spark.mask import mask
from pyspark.sql import functions as F
import pandas as pd
from pyspark.sql.types import LongType
cores = int(master.split("[")[1].rstrip("]"))
spark = get_spark("prof", master=master)
@F.pandas_udf(LongType())
def _warm(v: pd.Series) -> pd.Series: return v
spark.range(0, cores*1000, numPartitions=cores).select(_warm(F.col("id"))).count()
import os
pages_path = f"/tmp/prof_pages_{n}.parquet"
if not os.path.exists(pages_path + "/_SUCCESS"):
    from pprl_spark.fixtures import make_pages
    make_pages(spark, n, partitions=64).write.mode("overwrite").parquet(pages_path)
pages = spark.read.parquet(pages_path).repartition(cores*4)
cfg = MaskConfig(filter=CLKFilter(1024,5), hash=HashConfig(HashFunctionConfig(("sha256","md5")),"double_hash"),
                 token_size=2, padding="_", prepend_attribute_name=False,
                 attributes=(StaticAttributeConfig("text", AttributeSalt(attribute="url")),))
enc = mask(pages, cfg, ["text"], id_col="url")
t0=time.monotonic()
out = enc.agg(F.sum(F.length("bloom"))).collect()[0][0]
dt = time.monotonic()-t0
print(f"{master} salted-mask {n} pages: {dt:.1f}s = {n/dt:.0f} pages/s (bytes={out})", flush=True)
spark.stop()
