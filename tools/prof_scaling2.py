import sys, time; sys.path.insert(0,"/root/repo")
master = sys.argv[1]
from pprl_spark.spark.session import get_spark
from pprl_spark.config import *
from pprl_spark.spark.mask import mask
from pprl_spark.spark.lsh import LSHConfig, add_band_signatures
cores = int(master.split("[")[1].rstrip("]"))
spark = get_spark("prof", master=master)
spark.range(1000).selectExpr("sum(id)").collect()
pages = spark.read.parquet("/tmp/prof_pages.parquet").repartition(cores*4)
cfg = MaskConfig(filter=CLKFilter(1024,5), hash=HashConfig(HashFunctionConfig(("sha256","md5")),"double_hash"), token_size=2, padding="_", prepend_attribute_name=False)
def t(label, fn):
    t0=time.monotonic(); fn(); print(f"{master} {label:22s} {time.monotonic()-t0:7.1f}s", flush=True)
enc = mask(pages.withColumnRenamed("url","id"), cfg, ["text"])
t("mask.count#1", lambda: enc.count())
t("mask.count#2", lambda: enc.count())
banded = add_band_signatures(enc, LSHConfig(1024,16,12,seed=727))
t("banded.count", lambda: banded.count())
t("banded.groupBy", lambda: banded.groupBy("band","sig").count().count())
spark.stop()
