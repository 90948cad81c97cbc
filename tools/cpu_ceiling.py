"""Measure this machine's raw 8→32-process CPU scaling ceiling.

local[8] vs local[32] share one box: at low occupancy cores clock higher and
memory bandwidth is uncontended, so even an embarrassingly parallel workload
does not speed up 4.0x from 8 to 32 processes. This prints the ceiling that
normalizes the streaming-job efficiencies in BENCH.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def measure(n: int = 3_000_000, tasks_per_proc: int = 4) -> dict:
    out = {}
    for procs in (8, 32):
        with mp.Pool(procs) as p:
            t0 = time.time()
            p.map(_burn, [n] * procs * tasks_per_proc)
            dt = time.time() - t0
        out[f"ops_per_sec_{procs}"] = round(procs * tasks_per_proc * n / dt, 0)
    out["ceiling"] = round(out["ops_per_sec_32"] / out["ops_per_sec_8"] / 4.0, 3)
    return out


if __name__ == "__main__":
    print(json.dumps(measure()))
