"""CPU-throughput probe — the compute-side companion of membw_probe.py.

Round-4 finding (SCALING.json round4_scaling_protocol): a 1→4-core
measurement pair passed the bandwidth gate cleanly (BW ratios 3.98 pre /
4.04 post) yet measured efficiency 0.638 — the 4-core pipeline ran 63%
slower than an equal-bandwidth window minutes earlier. Streaming bandwidth
doesn't see CPU steal: on a co-tenant VM the host can cap aggregate
CPU while leaving the memory channels alone. This probe measures it:
``k`` pinned processes each run a cache-resident, single-threaded,
compute-bound numpy kernel (transcendentals on 400 KB — L2-resident, no
BLAS threading) and report aggregate iterations/s. On an uncontended box
the aggregate scales ~linearly in k; under steal it doesn't.

Usage: python scripts/cpu_probe.py <n_procs>
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")  # before numpy import
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import multiprocessing as mp
import sys
import time

import numpy as np


def worker(i, q):
    a = np.linspace(0.1, 1.0, 100_000, dtype=np.float32)  # 400 KB, L2-resident
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 2:
        np.sqrt(a * a + np.sin(a))  # compute-bound, single-threaded
        n += 1
    q.put(n / (time.perf_counter() - t0))


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(i, q)) for i in range(k)]
    [p.start() for p in ps]
    tot = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    print(f"CPU procs={k} {tot:.1f} iters/s")
