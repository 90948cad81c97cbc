"""Scale & skew stress evidence.

1. scale: the flagship pipelines over a ~30M-turn synthetic stream (10x the
   scaling-run input) at local[32] — shows throughput holds as input grows.
2. skew: mega-conversation density x20 (every 10th conversation has 400
   turns — worst-case agent-trace skew) — shows the stateful stages survive
   hot keys (bucketed CEP state + AQE; session/window state keys on conv_id).

r3 harness rules (the r1/r2 same-JVM form measured up to 3x residue
penalties on later jobs and ran state stores on the shared disk):
* one FRESH JVM per (input, job) cell, via tools/bench_cell.py;
* workdir/input on tmpfs when available;
* each cell gated on 1-min load < 1.5 (co-tenant bursts observed).

Prints JSON; appends the results table to BENCH.md §5 (curate by hand).
Usage: python tools/bench_stress.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def wait_quiet(max_load: float = 1.5, timeout: float = 900.0) -> float:
    t0 = time.time()
    load = os.getloadavg()[0]
    while load > max_load and time.time() - t0 < timeout:
        time.sleep(15)
        load = os.getloadavg()[0]
    return load


def cell(inp: str, job: str, mft: int = 128) -> dict:
    wait_quiet()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_cell.py"),
         "--input", inp, "--job", job, "--master", "local[32]",
         "--heap", "8g", "--partitions", "32", "--mft", str(mft)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.replace("\r", "\n").splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT; stderr tail: {p.stderr[-1500:]}")


def run(inp: str, tag: str) -> dict:
    res = {"tag": tag}
    for name in ("enrich_dedup", "window", "cep"):
        r = cell(inp, name)
        res["n_turns"] = r["n_turns"]
        res[name + "_tps"] = r["wall_tps"]
        res[name + "_sustained"] = r["tps"]
    return res


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dfmm_stress_", dir=base)
    results = []

    def gen(path: str, **kw) -> None:
        code = (
            "import sys; sys.path.insert(0, %r); "
            "from dataflow_mm_spark.session import get_spark; "
            "from dataflow_mm_spark.datagen import write_transcripts; "
            "write_transcripts(get_spark('gen', master='local[32]'), %r, %s)"
        ) % (REPO, path, ", ".join(f"{k}={v}" for k, v in kw.items()))
        subprocess.run([sys.executable, "-c", code], check=True,
                       capture_output=True)

    try:
        big = os.path.join(work, "big")
        gen(big, n_convs=2_600_000, files=256)
        results.append(run(big, "scale_30M"))
        shutil.rmtree(big, ignore_errors=True)

        skew = os.path.join(work, "skew")
        gen(skew, n_convs=60_000, files=256, mega_every=10, mega_turns=400)
        results.append(run(skew, "skew_x20"))
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(results, indent=2))
    lines = ["", "### §5 data refresh (append; fold into the table above)", ""]
    lines.append("| run | turns | enrich+dedup | window | cep |")
    lines.append("|---|---|---|---|---|")
    for r in results:
        lines.append(
            f"| {r['tag']} | {r['n_turns']:,} | {r['enrich_dedup_tps']:,.0f} | "
            f"{r['window_tps']:,.0f} | {r['cep_tps']:,.0f} |"
        )
    lines.append("")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
