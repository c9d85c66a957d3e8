import multiprocessing as mp, time, sys
def burn(n):
    x = 0
    for i in range(n): x += i*i
    return x
def run(procs, work=6_000_000):
    t0=time.time()
    with mp.Pool(procs) as p:
        p.map(burn, [work]*procs)   # each proc does same work => ideal: constant wall
    return time.time()-t0
if __name__ == "__main__":
    for n in (1, 4, 8, 16, 32):
        print(n, round(run(n), 3))
