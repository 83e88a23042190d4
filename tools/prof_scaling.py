import sys, time; sys.path.insert(0,"/root/repo")
master = sys.argv[1]
n = int(sys.argv[2])
from pprl_spark.spark.session import get_spark
from pprl_spark.fixtures import make_pages
from pprl_spark.config import *
from pprl_spark.spark.mask import mask
from pprl_spark.spark.lsh import LSHConfig, add_band_signatures
from pprl_spark.sketch import HyperLogLog, CountMinSketch, sketch_column
cores = int(master.split("[")[1].rstrip("]"))
spark = get_spark("prof", master=master)
spark.range(1000).selectExpr("sum(id)").collect()
def t(label, fn):
    t0=time.monotonic(); r=fn(); print(f"{label:24s} {time.monotonic()-t0:7.1f}s", flush=True); return r
pages = make_pages(spark, n, partitions=cores*4)
t("gen+write", lambda: pages.write.mode("overwrite").parquet("/tmp/prof_pages.parquet"))
pages = spark.read.parquet("/tmp/prof_pages.parquet")
cfg = MaskConfig(filter=CLKFilter(1024,5), hash=HashConfig(HashFunctionConfig(("sha256","md5")),"double_hash"), token_size=2, padding="_", prepend_attribute_name=False)
enc = mask(pages.withColumnRenamed("url","id"), cfg, ["text"])
t("mask.count", lambda: enc.count())
banded = add_band_signatures(enc, LSHConfig(1024,16,12,seed=727))
t("banded buckets", lambda: banded.groupBy("band","sig").count().count())
t("hll", lambda: sketch_column(pages, "url", lambda: HyperLogLog(p=14)).estimate())
t("cms", lambda: sketch_column(pages, "lang", lambda: CountMinSketch(2719,5)).estimate())
spark.stop()
