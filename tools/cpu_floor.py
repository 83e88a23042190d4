import time, multiprocessing as mp, hashlib

def burn(n):
    d = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        d = hashlib.sha256(d).digest()
    return time.time() - t0

if __name__ == "__main__":
    n = 2_000_000
    for procs in (1, 8, 32):
        t0 = time.time()
        with mp.Pool(procs) as p:
            times = p.map(burn, [n] * procs)
        wall = time.time() - t0
        print(f"procs={procs}: wall={wall:.2f}s per-proc-avg={sum(times)/len(times):.2f}s")
