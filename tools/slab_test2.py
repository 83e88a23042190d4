import sys, time, multiprocessing as mp
sys.path.insert(0,"/root/repo")

def work(args):
    lo, hi = args
    from pprl_spark.fixtures import page_row
    from pprl_spark.config import (MaskConfig, CLKFilter, HashConfig,
                                   HashFunctionConfig, StaticAttributeConfig, AttributeSalt)
    from pprl_spark.kernels.encode import BloomEncoder
    pages = [page_row(i) for i in range(lo, hi)]
    ids = [p["url"] for p in pages]
    cols = {"text": [p["text"] for p in pages], "id": ids}
    cfg = MaskConfig(filter=CLKFilter(1024,5),
                     hash=HashConfig(HashFunctionConfig(("sha256","md5")),"double_hash"),
                     token_size=2, padding="_", prepend_attribute_name=False,
                     attributes=(StaticAttributeConfig("text", AttributeSalt(attribute="id")),))
    enc = BloomEncoder(cfg, ["text"])
    t0 = time.time()
    enc.encode_batch(ids, cols)
    return (hi-lo), time.time()-t0

if __name__ == "__main__":
    for procs in (1, 2, 8, 32):
        n = 4000 * procs
        chunks = [(i*n//procs, (i+1)*n//procs) for i in range(procs)]
        with mp.Pool(procs) as pool:
            res = pool.map(work, chunks)
        rate_per_core = sum(r[0]/r[1] for r in res) / procs
        print(f"procs={procs:2d}: per-core {rate_per_core:6.0f} pages/s (encode only)", flush=True)
