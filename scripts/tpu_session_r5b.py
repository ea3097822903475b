"""Round-5 second TPU batch (run alone on the TPU, after tpu_session_r5).

1. bench   — warm-cache bench.py: validates prewarm_next_buckets on the
             real transport and records the clean two-object median (this
             morning's cold-cache run printed 0.07 FPS because two growth-
             rung compiles landed inside the single timed window).
2. track   — tpu_bisect_track.py: DCE-prefix breakdown of the track stage
             (16.3 ms in-context, the largest static stage) to pick the
             next optimisation target.
3. probe   — tpu_bisect_step.py static stage budget (skip if the r5
             session's probe stage already ran it).

Appends to /tmp/tpu_session_r5.log so a killed run still yields numbers.

    python scripts/tpu_session_r5b.py [stage ...]
"""
import os
import subprocess
import sys
import time

LOG = "/tmp/tpu_session_r5.log"


def run(name, cmd, timeout, env=None):
    with open(LOG, "a") as f:
        f.write(f"\n===== {name} ({time.strftime('%H:%M:%S')}) =====\n")
        f.flush()
        e = dict(os.environ)
        if env:
            e.update(env)
        try:
            subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           timeout=timeout, cwd="/root/repo", env=e)
        except subprocess.TimeoutExpired:
            f.write(f"\n[{name} TIMED OUT after {timeout}s]\n")
    print(f"{name} done", flush=True)


if __name__ == "__main__":
    with open(LOG, "a") as f:
        f.write(f"\nTPU session r5b started {time.ctime()} "
                f"stages={sys.argv[1:] or 'all'}\n")
    only = sys.argv[1:] or ["bench", "track"]
    py = sys.executable
    if "bench" in only:
        run("bench_warm", [py, "bench.py"], 5400,
            env={"MFT_BENCH_BUDGET": "4500"})
    if "track" in only:
        run("bisect_track", [py, "scripts/tpu_bisect_track.py"], 2400)
    if "probe" in only:
        run("bisect_step", [py, "scripts/tpu_bisect_step.py"], 1800)
        # channel-first predict tap-scan (parked experiment): measure the
        # TPU benefit that was never captured before deciding whether the
        # 3.8 mm pipelined-vs-sync divergence is worth localising
        run("probe_predict2", [py, "scripts/tpu_probe_predict2.py"], 1800)
    print("session r5b complete; log at", LOG, flush=True)
