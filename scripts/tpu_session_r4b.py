"""Round-4 second TPU measurement batch (run alone on the TPU):

1. tpu_bisect_step   — IN-CONTEXT static stage budget (prefix bisect; the
                       isolated probes under-measure by ~2x, see docstring)
2. tpu_probe_upload  — transport characterisation: device_put blocking,
                       RTT vs bandwidth, compute overlap
3. parity_vga        — VGA accuracy re-run under the blended object term
                       (VERDICT #3 MUST item)
4. deformation_bench — Eigen-LLT optimise @1024 nodes + on-device
                       apply_to_points @100k (VERDICT #6 targets)
5. train_rich        — 256 px multi-instance Mask R-CNN checkpoint
                       (VERDICT #8); saves the committed .npz artifact
6. probe_r4          — refreshed stage probes (now with tracebacks)

Appends to /tmp/tpu_session_r4.log so a killed run still yields numbers."""
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
    with open(LOG, "a") as f:
        f.write(f"\nTPU session r4b started {time.ctime()} "
                f"stages={sys.argv[1:] or 'all'}\n")
    only = sys.argv[1:] or ["bisect", "upload", "parity", "deform",
                            "rich", "probe"]
    py = sys.executable
    if "bisect" in only:
        run("bisect_step", [py, "scripts/tpu_bisect_step.py"], 1800)
    if "upload" in only:
        run("probe_upload", [py, "scripts/tpu_probe_upload.py"], 1200)
    if "parity" in only:
        run("parity_vga", [py, "scripts/parity_vga.py"], 4800)
    if "deform" in only:
        run("deformation", [py, "scripts/deformation_bench.py"], 1800)
    if "rich" in only:
        run("train_rich",
            [py, "scripts/train_rich_checkpoint.py", "--steps", "1500"],
            3600)
    if "probe" in only:
        run("probe_r4", [py, "scripts/tpu_probe_r4.py"], 2400)
    print("session r4b complete; log at", LOG, flush=True)
