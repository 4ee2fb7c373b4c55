"""Memory-bandwidth probe — context for the scaling-efficiency evidence.

The north rule's two-cluster-size criterion is proxied in this sandbox by
running the same job at two parallelism levels on one box. That proxy is
only meaningful while the box can still FEED the added cores: on this VM
the streaming bandwidth saturates at ~8 concurrent readers and then
degrades (measured: 1 proc 6.5 GB/s, 8 procs 83.9 GB/s, 32 procs
51.4 GB/s), so 8 -> 32 local threads adds compute but REMOVES bandwidth —
the opposite of adding executor NODES, each of which brings its own memory
channels. Scaling evidence therefore uses N=2 vs 4N=8 (below the knee);
the 8 vs 32 numbers are reported alongside with this ceiling noted.

Usage: python scripts/membw_probe.py <n_procs> [reps]   (pin with taskset)

``reps`` (default 1) measures N back-to-back 3-second windows over ONE
buffer setup and prints the median: the setup (process spawn + first-touch
faulting 240 MB/proc) costs up to ~20 s/proc under host allocation
pressure, so median-of-3 via three separate invocations paid 3x setup for
3x measurement — internal reps pay it once.
"""

import multiprocessing as mp
import sys
import time

import numpy as np


def worker(i, q, reps=1):
    # np.empty + fill, NOT np.random.rand(...).astype: the random path
    # allocates a 240 MB float64 temp per proc and its page-zeroing is
    # kernel-bound — measured 33 s wall / 3.5 min sys for 8 procs in a slow
    # host window, which blew bench.py's probe timeout and recorded nulls.
    # The measured loop below is unchanged; only setup cost differs.
    a = np.empty(30_000_000, dtype=np.float32)  # 120 MB >> LLC
    a.fill(np.float32(1.0))
    b = np.empty_like(a)
    # fault b in OUTSIDE the timed loop: first-touch page zeroing stalls to
    # ~20 s/proc under host allocation pressure (measured cold 0.2 GB/s vs
    # warm 52.6 GB/s in the same minute) — that is a fault-stall artifact,
    # not the streaming bandwidth this probe gates on
    np.multiply(a, np.float32(1.0001), out=b)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < 3:
            np.multiply(a, np.float32(1.0001), out=b)  # stream read + write
            n += 1
        vals.append(n * a.nbytes * 2 / (time.perf_counter() - t0))
    q.put(vals)


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(i, q, reps)) for i in range(k)]
    [p.start() for p in ps]
    per_proc = [q.get() for _ in ps]
    [p.join() for p in ps]
    # total bandwidth per rep window (procs run their windows in lockstep
    # modulo scheduler skew), then median across windows
    totals = sorted(sum(v[r] for v in per_proc) for r in range(reps))
    print(f"BW procs={k} {totals[len(totals) // 2] / 1e9:.1f} GB/s")
