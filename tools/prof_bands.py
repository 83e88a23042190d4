import sys, time; sys.path.insert(0,"/root/repo")
master = sys.argv[1]
from pprl_spark.spark.session import get_spark
from pprl_spark.config import *
from pprl_spark.spark.mask import mask
from pprl_spark.spark.lsh import LSHConfig, add_band_signatures, band_positions
from pyspark.sql import functions as F
cores = int(master.split("[")[1].rstrip("]"))
spark = get_spark("prof", master=master)
spark.range(1000).selectExpr("sum(id)").collect()
def t(label, fn):
    t0=time.monotonic(); fn(); print(f"{master} {label:26s} {time.monotonic()-t0:7.1f}s", flush=True)
pages = spark.read.parquet("/tmp/prof_pages.parquet").repartition(cores*4)
cfg = MaskConfig(filter=CLKFilter(1024,5), hash=HashConfig(HashFunctionConfig(("sha256","md5")),"double_hash"), token_size=2, padding="_", prepend_attribute_name=False)
enc = mask(pages.withColumnRenamed("url","id"), cfg, ["text"])
enc.write.mode("overwrite").parquet("/tmp/prof_enc.parquet")
enc2 = spark.read.parquet("/tmp/prof_enc.parquet")
lshc = LSHConfig(1024,16,12,seed=727)
t("bands-on-materialized", lambda: add_band_signatures(enc2, lshc).count())
t("bands-chained-after-mask", lambda: add_band_signatures(enc, lshc).count())
# JVM-side variant: getbit() from the binary column via substring+bit ops
pos = band_positions(lshc)
def jvm_bands(df):
    sig_cols = []
    for b in range(lshc.num_bands):
        bits = [
            F.shiftrightunsigned(
                F.ascii(F.substring(F.col("bloom"), int(p)//8 + 1, 1)), 7 - int(p)%8
            ).bitwiseAND(F.lit(1)).cast("long") * F.lit(1 << w)
            for w, p in enumerate(pos[b])
        ]
        col = bits[0]
        for x in bits[1:]:
            col = col + x
        sig_cols.append(col)
    return df.select("id", F.posexplode(F.array(*sig_cols)).alias("band","sig"))
t("bands-jvm-side", lambda: jvm_bands(enc2).count())
spark.stop()
