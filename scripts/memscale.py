import multiprocessing as mp, time
import numpy as np
def burn(n):
    a = np.random.bytes(32_000_000)
    buf = np.frombuffer(a, dtype=np.uint8)
    t0 = time.time()
    for _ in range(n):
        b = buf.astype(np.uint16)  # read+write pass, ~96MB traffic per iter
        del b
    return time.time() - t0
def run(procs, iters=12):
    with mp.Pool(procs) as p:
        ts = p.map(burn, [iters]*procs)
    return sum(ts)/len(ts)
if __name__ == "__main__":
    for n in (1, 8, 32):
        print(n, "mean per-proc sec:", round(run(n), 3))
