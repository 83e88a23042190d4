import sys, time; sys.path.insert(0,"/root/repo")
master = sys.argv[1]; n = int(sys.argv[2])
from pprl_spark.spark.session import get_spark
from pprl_spark.fixtures import make_pages
from pprl_spark.config import *
from pprl_spark.spark.mask import mask
from pprl_spark.spark.lsh import LSHConfig, add_band_signatures
from pprl_spark.sketch import HyperLogLog, CountMinSketch, sketch_column
from pyspark.sql import functions as F
import pandas as pd
from pyspark.sql.types import LongType
cores = int(master.split("[")[1].rstrip("]"))
spark = get_spark("prof", master=master)
@F.pandas_udf(LongType())
def _warm(v: pd.Series) -> pd.Series: return v
spark.range(0, cores*1000, numPartitions=cores).select(_warm(F.col("id"))).count()
def t(label, fn):
    t0=time.monotonic(); fn(); print(f"{master} {label:18s} {time.monotonic()-t0:7.1f}s", flush=True)
pages_path = f"/tmp/prof_pages_{n}.parquet"
import os
if not os.path.exists(pages_path + "/_SUCCESS"):
    make_pages(spark, n, partitions=64).write.mode("overwrite").parquet(pages_path)
pages = spark.read.parquet(pages_path)
cfg = MaskConfig(filter=CLKFilter(1024,5), hash=HashConfig(HashFunctionConfig(("sha256","md5")),"double_hash"), token_size=2, padding="_", prepend_attribute_name=False)
enc = mask(pages.withColumnRenamed("url","id"), cfg, ["text"]).repartition("id")
t("mask+repart", lambda: enc.count())
banded = add_band_signatures(enc, LSHConfig(1024,16,12,seed=727))
t("bands+groupBy", lambda: banded.groupBy("band","sig").count().count())
t("hll", lambda: sketch_column(pages, "url", lambda: HyperLogLog(p=14)).estimate())
t("cms", lambda: sketch_column(pages, "lang", lambda: CountMinSketch(2719,5)).estimate())
spark.stop()
