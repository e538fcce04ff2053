"""Round-6 re-run of the N->4N scaling sweep on the final tree.

Same methodology as bench.run_scaling (500k-row legacy corpus, levels
local[2]/local[8]/local[32], warmed min-of-2 reps, subprocess-isolated
JVMs) but writes BENCH/SCALING_r06.md + raw JSON instead of overwriting
round 5's BASELINE.md artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def main(levels=(2, 8, 32), reps=2, bench_n=500_000):
    env = dict(os.environ, SPARK_GRAFT_BENCH_N=str(bench_n))
    results = {}
    for threads in levels:
        out = subprocess.run(
            [sys.executable, BENCH, "--master", f"local[{threads}]",
             "--spatial-only", "--reps", str(reps), "--legs", "legacy"],
            capture_output=True, text=True, cwd=REPO, env=env,
        )
        line = [ln for ln in out.stdout.strip().split("\n") if ln.startswith("{")][-1]
        results[threads] = json.loads(line)
        print(threads, results[threads]["spatial_sec"],
              results[threads]["throughput_rows_per_sec"], flush=True)

    thr = {t: results[t]["throughput_rows_per_sec"] for t in levels}
    eff_2_8 = (thr[8] / thr[2]) / 4.0
    eff_8_32 = (thr[32] / thr[8]) / 4.0
    with open(os.path.join(REPO, "BENCH", "scaling_raw_r06.json"), "w") as f:
        json.dump({str(t): results[t] for t in levels}, f, indent=1)
    with open(os.path.join(REPO, "BENCH", "SCALING_r06.md"), "w") as f:
        f.write(
            "# BENCH/SCALING_r06 — N -> 4N gate re-check on the round-6 tree\n\n"
            "Same sweep as BENCH/BASELINE.md (500k-row legacy corpus,\n"
            f"warmed min-of-{reps}, subprocess JVM per level) re-run after the\n"
            "round-6 optimizations, committed separately so round 5's\n"
            "artifact stays untouched.\n\n"
            "| config | n_images | spatial wall (s) | throughput (rows/s) |\n"
            "|---|---|---|---|\n"
        )
        for t in levels:
            r = results[t]
            f.write(f"| local[{t}] | {r['n_images']} | {r['spatial_sec']} | "
                    f"{r['throughput_rows_per_sec']} |\n")
        f.write(
            f"\n- local[2] -> local[8]: eff = {eff_2_8:.3f} "
            f"{'(meets the >= 0.8 gate)' if eff_2_8 >= 0.8 else '(below gate)'}\n"
            f"- local[8] -> local[32]: eff = {eff_8_32:.3f} (single-box memory-"
            "bandwidth ceiling; see BASELINE.md discussion)\n\n"
            "Per-stage seconds (min of reps):\n\n"
        )
        f.write("| stage |" + "".join(f" local[{t}] |" for t in levels) + "\n")
        f.write("|---|" + "---|" * len(levels) + "\n")
        for k in results[levels[0]]["queries"]:
            f.write(f"| {k} |" + "".join(
                f" {results[t]['queries'][k]} |" for t in levels) + "\n")
    print(json.dumps({"eff_2_8": eff_2_8, "eff_8_32": eff_8_32, "thr": thr}))


if __name__ == "__main__":
    main()
