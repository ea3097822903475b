"""One-shot TPU measurement session (run alone on the TPU):
1. bench.py static + two-object headline lines
2. Mask R-CNN 512px/81cls inference latency (VERDICT #3)
3. stage budget probe (tpu_probe_r4)

Writes everything to /tmp/tpu_session_r3.log as it goes so a killed run
still yields partial numbers."""
import subprocess
import sys
import time

LOG = "/tmp/tpu_session_r3.log"


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
    open(LOG, "w").write(f"TPU session started {time.ctime()}\n")
    run("bench", [sys.executable, "bench.py"], 2400)
    run("nn_latency", [sys.executable, "scripts/tpu_nn_latency.py"], 1800)
    run("probe_r4", [sys.executable, "scripts/tpu_probe_r4.py"], 2400)
    run("parity_vga", [sys.executable, "scripts/parity_vga.py"], 3600)
    print("session complete; log at", LOG, flush=True)

# appended: VGA parity re-run (object tracking changed in round 3)
# run manually if the unattended session has time:
#   timeout 3600 python scripts/parity_vga.py >> /tmp/tpu_session_r3.log
