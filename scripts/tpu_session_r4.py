"""Round-4 one-shot TPU measurement session (run alone on the TPU):

1. diag_two_object  — per-frame wall times under the prefused pipeline
2. bench.py         — static (median of 3) + two-object headline lines
3. tpu_probe_r4     — stage budget scalar probes
4. tpu_nn_latency   — Mask R-CNN 512px/81cls forward (VERDICT #4)
5. parity_vga       — VGA accuracy re-run under the blended object term
                      (VERDICT #3), exact schedule

Writes everything to /tmp/tpu_session_r4.log as it goes so a killed run
still yields partial numbers."""
import subprocess
import sys
import time

LOG = "/tmp/tpu_session_r4.log"


def run(name, cmd, timeout):
    with open(LOG, "a") as f:
        f.write(f"\n===== {name} ({time.strftime('%H:%M:%S')}) =====\n")
        f.flush()
        try:
            subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           timeout=timeout, cwd="/root/repo")
        except subprocess.TimeoutExpired:
            f.write(f"\n[{name} TIMED OUT after {timeout}s]\n")
    print(f"{name} done", flush=True)


if __name__ == "__main__":
    # append — a later stage-selective invocation must not clobber the
    # previous stages' numbers
    with open(LOG, "a") as f:
        f.write(f"\nTPU session r4 started {time.ctime()} "
                f"stages={sys.argv[1:] or 'all'}\n")
    only = sys.argv[1:] or ["diag", "bench", "probe", "nn", "parity"]
    if "diag" in only:
        run("diag_two_object",
            [sys.executable, "scripts/diag_two_object.py"], 2400)
    if "bench" in only:
        run("bench", [sys.executable, "bench.py"], 3000)
    if "probe" in only:
        run("probe_r4", [sys.executable, "scripts/tpu_probe_r4.py"], 2400)
    if "nn" in only:
        run("nn_latency", [sys.executable, "scripts/tpu_nn_latency.py"], 1800)
    if "parity" in only:
        run("parity_vga", [sys.executable, "scripts/parity_vga.py"], 3600)
    if "deform" in only:
        run("deformation",
            [sys.executable, "scripts/deformation_bench.py"], 1200)
    print("session complete; log at", LOG, flush=True)
