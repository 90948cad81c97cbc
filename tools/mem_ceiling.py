"""Measure this machine's raw 8→32-process MEMORY-BANDWIDTH scaling ceiling.

Companion to cpu_ceiling.py (pure-register compute). Streaming state jobs
are dominated by memory traffic — UnsafeRow copies, state-map clones, delta
serialization, Arrow buffers — and this box has ONE memory bus shared by
all 32 cores, while a real 4N-executor cluster brings 4x buses. A
STREAM-style copy kernel (numpy, arrays far larger than LLC) bounds the
8→32 efficiency attainable by any bandwidth-bound stage; real jobs land
between this and the cpu_ceiling depending on their memory intensity.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _stream(n_bytes: int) -> float:
    import numpy as np

    a = np.ones(n_bytes // 8)
    b = np.empty_like(a)
    reps = 4
    t0 = time.time()
    for _ in range(reps):
        np.copyto(b, a)     # read n + write n bytes
        a += 1.0            # read n + write n bytes
    dt = time.time() - t0
    return reps * 4 * n_bytes / dt  # bytes moved per second


def measure(n_bytes: int = 256 * 2**20, tasks_per_proc: int = 3) -> dict:
    out = {}
    for procs in (8, 32):
        with mp.Pool(procs) as p:
            # warm pool
            p.map(_stream, [2**20] * procs)
            t0 = time.time()
            p.map(_stream, [n_bytes] * procs * tasks_per_proc)
            dt = time.time() - t0
        total = procs * tasks_per_proc * 4 * 4 * n_bytes
        out[f"gbytes_per_sec_{procs}"] = round(total / dt / 2**30, 1)
    out["ceiling"] = round(
        out["gbytes_per_sec_32"] / out["gbytes_per_sec_8"] / 4.0, 3
    )
    return out


if __name__ == "__main__":
    print(json.dumps(measure()))
