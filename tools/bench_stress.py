"""Scale & skew stress evidence.

1. scale: the flagship pipelines over a ~30M-turn synthetic stream (10x the
   scaling-run input) at local[32] — shows throughput holds as input grows.
2. skew: mega-conversation density x20 (every 10th conversation has 400
   turns — worst-case agent-trace skew) — shows the stateful stages survive
   hot keys (bucketed CEP state + AQE; session/window state keys on conv_id).

Appends results to BENCH.md §5. Usage: python tools/bench_stress.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(spark, inp: str, work: str, tag: str) -> dict:
    from dataflow_mm_spark.streaming import jobs

    n = spark.read.parquet(inp).count()
    res = {"tag": tag, "n_turns": n}
    for name, fn in [
        ("enrich_dedup", lambda o, c: jobs.turns_pipeline(
            spark, inp, o, c, dedup=True, max_files_per_trigger=128)),
        ("window", lambda o, c: jobs.windowed_pipeline(
            spark, inp, o, c, max_files_per_trigger=128)),
        ("cep", lambda o, c: jobs.cep_pipeline(
            spark, inp, o, c, max_files_per_trigger=128)),
    ]:
        out, ck = os.path.join(work, f"{tag}_{name}_o"), os.path.join(work, f"{tag}_{name}_c")
        t0 = time.time()
        q, _ = fn(out, ck)
        q.awaitTermination()
        dt = time.time() - t0
        res[name + "_tps"] = round(n / dt, 0)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
    return res


def main() -> None:
    from dataflow_mm_spark.datagen import write_transcripts
    from dataflow_mm_spark.session import get_spark

    spark = get_spark("stress", master="local[32]")
    work = tempfile.mkdtemp(prefix="dfmm_stress_")
    results = []
    try:
        big = os.path.join(work, "big")
        write_transcripts(spark, big, n_convs=2_600_000, files=256)
        results.append(run(spark, big, work, "scale_30M"))
        shutil.rmtree(big, ignore_errors=True)

        skew = os.path.join(work, "skew")
        write_transcripts(
            spark, skew, n_convs=60_000, files=256, mega_every=10, mega_turns=400
        )
        results.append(run(spark, skew, work, "skew_x20"))
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(results, indent=2))
    lines = ["", "## 5. Scale & skew stress (local[32], wall-clock turns/s)", ""]
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
