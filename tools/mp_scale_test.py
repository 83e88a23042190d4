import sys, time, multiprocessing as mp
sys.path.insert(0,"/root/repo")

def work(args):
    lo, hi = args
    from pprl_spark.fixtures import make_pages_local, page_row
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
    BloomEncoder(cfg, ["text"]).encode_batch(ids, cols)
    return hi - lo

if __name__ == "__main__":
    n = 64000
    for procs in (8, 32):
        chunks = [(i*n//procs, (i+1)*n//procs) for i in range(procs)]
        t0 = time.time()
        with mp.Pool(procs) as pool:
            total = sum(pool.map(work, chunks))
        dt = time.time()-t0
        print(f"procs={procs}: {total/dt:.0f} pages/s  ({dt:.1f}s)")
