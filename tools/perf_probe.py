"""Hardware scaling-ceiling probe — NO Spark, NO repo code.

Measures aggregate memory-streaming throughput (numpy float64 sum over a
per-process 1 GiB array, separate OS processes, no GIL sharing) at
increasing process counts. A trivially parallel workload like this has a
textbook efficiency of 1.0 on hardware whose per-core memory bandwidth
scales with cores (i.e. a real multi-node cluster). On a single shared
VM the aggregate GB/s saturates, and its efficiency-vs-procs curve is a
*hardware* property that upper-bounds any data-scan workload's scaling
efficiency measured on the same box — including bench.py's validation
stage (parquet decompress + codegen'd expression eval is memory-traffic
dominated per doc).

Prints one JSON line: {"probe": "membw", "gib": 1.0,
  "levels": {"1": {"sec": s, "gbps": g, "eff_vs_1": e}, ...}}

Usage: python tools/perf_probe.py [levels ...]   (default 1 2 4 8 16 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

GIB = 1 << 30
N = GIB // 8  # float64 count = 1 GiB per process


def _stream(barrier, out, passes: int = 16) -> None:
    import numpy as np

    a = np.ones(N, dtype=np.float64)
    a.sum()  # fault pages in before the measured region
    barrier.wait()
    t0 = time.time()
    s = 0.0
    for _ in range(passes):
        s += a.sum()
    out.put((time.time() - t0, s))


def measure(procs: int) -> dict:
    barrier = mp.Barrier(procs)
    out: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_stream, args=(barrier, out)) for _ in range(procs)]
    for p in ps:
        p.start()
    secs = [out.get(timeout=600)[0] for _ in ps]
    for p in ps:
        p.join()
    wall = max(secs)
    gbps = procs * 16 * 1.0 / wall  # passes * GiB / s, aggregate
    return {"sec": round(wall, 3), "gbps": round(gbps, 2)}


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    res = {}
    base = None
    for lvl in levels:
        m = measure(lvl)
        if base is None:
            base = m["gbps"]
        m["eff_vs_1"] = round(m["gbps"] / (base * lvl / levels[0]), 3)
        res[str(lvl)] = m
    print(json.dumps({"probe": "membw", "gib": 1.0, "levels": res}))


if __name__ == "__main__":
    main()
