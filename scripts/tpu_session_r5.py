"""Round-5 TPU measurement batch (run alone on the TPU; VERDICT r4 items).

1. bench    — full bench.py (static + two-object + nn_in_loop) with a wide
              budget: warms the persistent cache (incl. the NEW
              min_object_slots=2 padded two-object graphs) so the driver's
              end-of-round run is all cache hits and lands rc=0 (item #1),
              and records all three lines (items #2, #3, #5).
2. parity   — parity_vga.py precomputed, 200 frames (item #4 — the MUST
              re-run under the blended object tracker).
3. cofusion — parity_vga.py --method cofusion (item #9: CfSegmentation
              end-to-end evidence).
4. deform   — deformation_bench.py incl. the device-side map apply
              (item #6: per-closure ms figure).
5. nnq      — nn_quality_eval.py (item #5: held-out mAP/mask-IoU).
6. probe    — tpu_bisect_step.py static stage budget (item #2 follow-up:
              where the next milliseconds are).

Appends to /tmp/tpu_session_r5.log so a killed run still yields numbers.

    python scripts/tpu_session_r5.py [stage ...]
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
        f.write(f"\nTPU session r5 started {time.ctime()} "
                f"stages={sys.argv[1:] or 'all'}\n")
    only = sys.argv[1:] or ["bench", "parity", "cofusion", "deform",
                            "nnq", "probe"]
    py = sys.executable
    if "bench" in only:
        run("bench", [py, "bench.py"], 5400,
            env={"MFT_BENCH_BUDGET": "4500"})
    if "parity" in only:
        run("parity_vga", [py, "scripts/parity_vga.py"], 4800)
    if "cofusion" in only:
        run("parity_cofusion",
            [py, "scripts/parity_vga.py", "--method", "cofusion",
             "--frames", "100"], 4800)
    if "deform" in only:
        run("deformation", [py, "scripts/deformation_bench.py"], 1800)
    if "nnq" in only:
        run("nn_quality", [py, "scripts/nn_quality_eval.py"], 2400)
    if "probe" in only:
        run("bisect_step", [py, "scripts/tpu_bisect_step.py"], 1800)
    print("session r5 complete; log at", LOG, flush=True)
