import sys, time, multiprocessing as mp
sys.path.insert(0,"/root/repo")

def work(args):
    lo, hi, slab = args
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
    for s in range(0, hi-lo, slab):
        enc.encode_batch(ids[s:s+slab], {k: v[s:s+slab] for k, v in cols.items()})
    return (hi-lo) / (time.time()-t0)

if __name__ == "__main__":
    for slab in (10000, 1024):
        for procs in (2, 8, 32):
            n = 3000 * procs
            chunks = [(i*n//procs, (i+1)*n//procs, slab) for i in range(procs)]
            t0 = time.time()
            with mp.Pool(procs) as pool:
                rates = pool.map(work, chunks)
            wall = time.time()-t0
            print(f"slab={slab:6d} procs={procs:2d}: {n/wall:7.0f} pages/s total, per-core {n/wall/procs:5.0f}", flush=True)
