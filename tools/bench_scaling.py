"""Two-parallelism scaling evidence (BASELINE.json north rule).

The rule's criterion — ≥0.8 throughput scaling efficiency from N to 4N
executors — cannot use a real cluster in this sandbox, so the same streaming
job runs at local[8] and local[32] over the SAME pre-generated input, each in
a fresh JVM (subprocess), and efficiency = (tp_32 / tp_8) / 4.

Usage: python tools/bench_scaling.py [n_convs]  → prints JSON, updates BENCH.md
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

master, inp, work = sys.argv[1], sys.argv[2], sys.argv[3]
MFT = 32  # 64 input files -> 2 large micro-batches; batch 1 is the sustained sample
spark = get_spark("scale", master=master)
n = spark.read.parquet(inp).count()
res = {"master": master, "n_turns": n}
for name, fn in [
    ("enrich_dedup", lambda o, c: jobs.turns_pipeline(
        spark, inp, o, c, dedup=True, max_files_per_trigger=MFT)),
    ("window", lambda o, c: jobs.windowed_pipeline(
        spark, inp, o, c, max_files_per_trigger=MFT)),
    ("cep", lambda o, c: jobs.cep_pipeline(
        spark, inp, o, c, max_files_per_trigger=MFT)),
]:
    out, ck = os.path.join(work, name + "_out"), os.path.join(work, name + "_ck")
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
    res[name + "_sec"] = round(dt, 2)
    res[name + "_wall_tps"] = round(n / dt, 1)
    res[name + "_tps"] = round(rows / secs, 1) if secs > 0 else None
    res[name + "_batches"] = len(prog)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
print("RESULT " + json.dumps(res))
"""


def run_child(master: str, inp: str, work: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(CHILD % {"repo": REPO})
        path = f.name
    try:
        p = subprocess.run(
            [sys.executable, path, master, inp, work],
            capture_output=True, text=True, timeout=1800,
        )
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(f"no RESULT line; stderr tail: {p.stderr[-2000:]}")
    finally:
        os.unlink(path)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    work = tempfile.mkdtemp(prefix="dfmm_scale_")
    inp = os.path.join(work, "turns_in")

    gen = (
        "import sys; sys.path.insert(0, %r); "
        "from dataflow_mm_spark.session import get_spark; "
        "from dataflow_mm_spark.datagen import write_transcripts; "
        "s = get_spark('gen', master='local[32]'); "
        "write_transcripts(s, %r, n_convs=%d, files=64)"
    ) % (REPO, inp, n_convs)
    subprocess.run([sys.executable, "-c", gen], check=True, capture_output=True)

    try:
        r8 = run_child("local[8]", inp, work)
        r32 = run_child("local[32]", inp, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    eff = {
        k[:-4]: round((r32[k] / r8[k]) / 4.0, 3)
        for k in r8
        if k.endswith("_tps")
    }
    out = {"n_turns": r8["n_turns"], "local8": r8, "local32": r32,
           "scaling_efficiency": eff}
    print(json.dumps(out, indent=2))

    lines = [
        "",
        "## Measured scaling evidence (round 1, sandbox local mode)",
        "",
        f"Same input ({r8['n_turns']:,} synthetic turns, seed 42), same jobs, "
        "fresh JVM per parallelism level; efficiency = (tp@local[32] / tp@local[8]) / 4.",
        "",
        "| job | local[8] turns/s | local[32] turns/s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for k, e in eff.items():
        lines.append(
            f"| {k} | {r8[k+'_tps']:,} | {r32[k+'_tps']:,} | "
            f"{round(r32[k+'_tps']/r8[k+'_tps'],2)}x | {e} |"
        )
    lines.append("")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
