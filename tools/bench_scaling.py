"""Two-parallelism scaling evidence (BASELINE.json north rule).

The rule's criterion — ≥0.8 throughput scaling efficiency from N to 4N
executors — cannot use a real cluster in this sandbox, so the same streaming
job runs at local[8] and local[32] over the SAME pre-generated input and
efficiency = (tp_32 / tp_8) / 4.

Methodology (revised round 2 after measuring run-to-run noise):
* one FRESH JVM per (job, parallelism) cell — running three streaming jobs
  back-to-back in one JVM leaves block-manager/state/GC residue that slowed
  the LAST job up to 3x (measured: cep 13.3s isolated vs 39s third-in-JVM);
* ``--repeat N`` (default 2) repeats every cell and keeps the BEST
  throughput: on a shared sandbox, interference only ever subtracts, so the
  max is the least-polluted estimate of the machine's capability;
* cells alternate 8/32 so disk-cache warmth doesn't systematically favor one
  side.

Usage: python tools/bench_scaling.py [n_convs] [--repeat N]
       → prints JSON, appends BENCH.md
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, shutil
sys.path.insert(0, %(repo)r)
from dataflow_mm_spark.session import get_spark
from dataflow_mm_spark.streaming import jobs

master, inp, work, name = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
MFT = 64  # 256 input files -> 4 micro-batches; batches 1+ are the sustained sample
spark = get_spark("scale", master=master)
n = spark.read.parquet(inp).count()
FNS = {
    "enrich_dedup": lambda o, c: jobs.turns_pipeline(
        spark, inp, o, c, dedup=True, max_files_per_trigger=MFT),
    "window": lambda o, c: jobs.windowed_pipeline(
        spark, inp, o, c, max_files_per_trigger=MFT),
    "cep": lambda o, c: jobs.cep_pipeline(
        spark, inp, o, c, max_files_per_trigger=MFT),
}
fn = FNS[name]
out, ck = os.path.join(work, name + "_out"), os.path.join(work, name + "_ck")
shutil.rmtree(out, ignore_errors=True)
shutil.rmtree(ck, ignore_errors=True)
t0 = time.time()
q, _ = fn(out, ck)
q.awaitTermination()
dt = time.time() - t0
prog = [json.loads(p.json) for p in q.recentProgress]
# sustained: steady-state batches only (skip batch 0 = cold start: JVM
# warmup, codegen compile, state store init)
steady = [p for p in prog[1:] if p.get("numInputRows", 0) > 0]
rows = sum(p["numInputRows"] for p in steady)
secs = sum(p["durationMs"]["triggerExecution"] for p in steady) / 1000.0
res = {"master": master, "n_turns": n, "job": name,
       "sec": round(dt, 2), "wall_tps": round(n / dt, 1),
       "tps": round(rows / secs, 1) if secs > 0 else None,
       "batches": len(prog)}
shutil.rmtree(out, ignore_errors=True)
shutil.rmtree(ck, ignore_errors=True)
print("RESULT " + json.dumps(res))
"""

JOBS = ["enrich_dedup", "window", "cep"]


def run_child(master: str, inp: str, work: str, job: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(CHILD % {"repo": REPO})
        path = f.name
    try:
        p = subprocess.run(
            [sys.executable, path, master, inp, work, job],
            capture_output=True, text=True, timeout=1800,
        )
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(f"no RESULT line; stderr tail: {p.stderr[-2000:]}")
    finally:
        os.unlink(path)


def main() -> None:
    # proper flag parsing: a space-separated `--repeat 3` must not leak its
    # value into the n_convs positional
    argv = sys.argv[1:]
    repeat, positionals, i = 2, [], 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--repeat"):
            if "=" in a:
                repeat = int(a.split("=", 1)[1])
            else:
                repeat = int(argv[i + 1])
                i += 1
        else:
            positionals.append(a)
        i += 1
    n_convs = int(positionals[0]) if positionals else 100_000
    work = tempfile.mkdtemp(prefix="dfmm_scale_")
    inp = os.path.join(work, "turns_in")

    gen = (
        "import sys; sys.path.insert(0, %r); "
        "from dataflow_mm_spark.session import get_spark; "
        "from dataflow_mm_spark.datagen import write_transcripts; "
        "s = get_spark('gen', master='local[32]'); "
        "write_transcripts(s, %r, n_convs=%d, files=256)"
    ) % (REPO, inp, n_convs)
    subprocess.run([sys.executable, "-c", gen], check=True, capture_output=True)

    best: dict[tuple[str, str], dict] = {}
    n_turns = None
    try:
        for _ in range(repeat):
            for job in JOBS:
                for master in ("local[8]", "local[32]"):
                    r = run_child(master, inp, work, job)
                    print("CELL " + json.dumps(r), flush=True)
                    n_turns = r["n_turns"]
                    key = (job, master)
                    if key not in best or (r["tps"] or 0) > (best[key]["tps"] or 0):
                        best[key] = r
    finally:
        shutil.rmtree(work, ignore_errors=True)

    eff = {}
    for job in JOBS:
        r8, r32 = best[(job, "local[8]")], best[(job, "local[32]")]
        eff[job] = {
            "tps8": r8["tps"], "tps32": r32["tps"],
            "wall8": r8["wall_tps"], "wall32": r32["wall_tps"],
            "efficiency": round((r32["tps"] / r8["tps"]) / 4.0, 3),
            "wall_efficiency": round((r32["wall_tps"] / r8["wall_tps"]) / 4.0, 3),
        }
    out = {"n_turns": n_turns, "repeat": repeat, "jobs": eff}
    print(json.dumps(out, indent=2))
    # committed snapshot picked up by bench.py so the driver-recorded
    # BENCH_r{N}.json carries the scaling evidence alongside throughput
    with open(os.path.join(REPO, "tools", "scaling_latest.json"), "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "",
        "## Measured scaling evidence (sandbox local mode, fresh JVM per cell)",
        "",
        f"Same input ({n_turns:,} synthetic turns, seed 42); best of {repeat} "
        "runs per (job, parallelism) cell (shared-box interference only "
        "subtracts); efficiency = (tp@local[32] / tp@local[8]) / 4.",
        "",
        "| job | local[8] turns/s | local[32] turns/s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for job, e in eff.items():
        lines.append(
            f"| {job} (sustained) | {e['tps8']:,} | {e['tps32']:,} | "
            f"{round(e['tps32']/e['tps8'],2)}x | {e['efficiency']} |"
        )
        lines.append(
            f"| {job} (wall) | {e['wall8']:,} | {e['wall32']:,} | "
            f"{round(e['wall32']/e['wall8'],2)}x | {e['wall_efficiency']} |"
        )
    lines.append("")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
