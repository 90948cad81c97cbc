"""4-executor scaling model (north rule N→4N evidence) — committed form of
the r3 ad-hoc protocol.

A real 4N cluster is 4 independent 8-core executors over disjoint key
ranges, not one 32-thread JVM. Model: shard the input by
hash(conv_id) % 4 into 4 dirs; a CELL is one taskset-pinned local[8] JVM
with 8 state partitions running one shard (tools/bench_cell.py). Measure:

* alone:      one cell on shard 0, pinned to cores 0-7, box otherwise idle;
* concurrent: 4 cells simultaneously, pinned to disjoint 8-core sets, each
              owning its shard (zero engine-level coupling between JVMs);
* efficiency = sum(concurrent sustained tps) / (4 × alone sustained tps).

The only shared resource is the box's memory bus + tmpfs — exactly the
resource a real 4N cluster quadruples, so the measured loss bounds the
engine's bandwidth appetite, not its coordination (there is none).

Usage:
  python tools/bench_exec_model.py [n_convs] [--jobs cep,window]
      [--input DIR] [--passes 2] [--mft 16] [--buckets N]
Prints one JSON blob; merge into tools/scaling_latest.json by hand after
curating (BENCH.md protocol: runs are invalid if the box is not quiet).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import wait_quiet  # noqa: E402  (same-dir import)


def sh(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def gen_shards(n_convs: int, work: str, inp: str | None,
               files: int = 64) -> list[str]:
    shards = [os.path.join(work, f"shard{i}") for i in range(4)]
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from dataflow_mm_spark.session import get_spark
spark = get_spark('shard', master='local[32]')
"""
    if inp:
        code += f"df = spark.read.parquet({inp!r})\n"
    else:
        code += f"""
from dataflow_mm_spark.datagen import transcripts
df = transcripts(spark, n_convs={n_convs})
"""
    code += f"""
df = df.withColumn('_s', F.pmod(F.xxhash64('conv_id'), F.lit(4)))
for i in range(4):
    (df.filter(F.col('_s') == i).drop('_s')
       .repartition({files}, F.xxhash64('conv_id', 'turn_idx'))
       .write.mode('overwrite').parquet({work!r} + f'/shard{{i}}'))
print('SHARDED')
"""
    r = sh([sys.executable, "-c", code], timeout=1200)
    if "SHARDED" not in r.stdout:
        raise RuntimeError(f"shard gen failed: {r.stderr[-2000:]}")
    return shards


def run_cell(shard: str, cores: str, job: str, mft: int, work: str,
             background: bool = False):
    cmd = [
        "taskset", "-c", cores, sys.executable,
        os.path.join(REPO, "tools", "bench_cell.py"),
        "--input", shard, "--job", job, "--master", "local[8]",
        "--partitions", "8", "--mft", str(mft),
    ]
    env = dict(os.environ, TMPDIR=work)
    if background:
        return subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, env=env,
        )
    return sh(cmd, timeout=1800, env=env)


def parse_tps(stdout: str) -> dict | None:
    for line in stdout.splitlines():
        idx = line.find("RESULT ")
        if idx >= 0:
            return json.loads(line[idx + len("RESULT "):])
    return None


def main() -> None:
    args = sys.argv[1:]
    n_convs, jobs, passes, mft, inp, files = 1_200_000, ["cep"], 2, 16, None, 64
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--jobs":
            i += 1
            jobs = args[i].split(",")
        elif a == "--passes":
            i += 1
            passes = int(args[i])
        elif a == "--mft":
            i += 1
            mft = int(args[i])
        elif a == "--input":
            i += 1
            inp = args[i]
        elif a == "--files":
            i += 1
            files = int(args[i])
        elif not a.startswith("--"):
            n_convs = int(a)
        i += 1

    work = tempfile.mkdtemp(prefix="dfmm_exec_", dir="/dev/shm")
    out: dict = {"model": "4x local[8] key-disjoint shards", "jobs": {}}
    try:
        shards = gen_shards(n_convs, work, inp, files)
        sets = ["0-7", "8-15", "16-23", "24-31"]
        for job in jobs:
            results = []
            for p in range(passes):
                load = wait_quiet()
                alone = parse_tps(run_cell(shards[0], sets[0], job, mft, work).stdout)
                load2 = wait_quiet()
                procs = [
                    run_cell(shards[i], sets[i], job, mft, work, background=True)
                    for i in range(4)
                ]
                cells = []
                for pr in procs:
                    so, _ = pr.communicate(timeout=1800)
                    cells.append(parse_tps(so))
                # sustained tps when every cell has steady batches (needs
                # mft < files/shard); wall tps fallback otherwise — the two
                # are never mixed within one efficiency ratio
                use_tps = bool(
                    alone and alone["tps"]
                    and all(c and c["tps"] for c in cells)
                )
                key_ = "tps" if use_tps else "wall_tps"
                csum = sum(c[key_] for c in cells if c and c[key_])
                base = alone and alone[key_]
                eff = round(csum / (4 * base), 3) if base else None
                rec = {
                    "metric": key_,
                    "alone_tps": alone and alone["tps"],
                    "alone_wall_tps": alone and alone["wall_tps"],
                    "concurrent_tps": [c and c[key_] for c in cells],
                    "concurrent_sum_tps": round(csum, 1),
                    "efficiency": eff,
                    "load_alone": round(load, 2),
                    "load_concurrent": round(load2, 2),
                    "n_turns_shard": alone and alone["n_turns"],
                }
                results.append(rec)
                print(f"PASS {job} {p}: " + json.dumps(rec), flush=True)
            best = max(results, key=lambda r: r["efficiency"] or 0)
            out["jobs"][job] = {"passes": results, "best": best}
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
