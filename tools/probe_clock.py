"""Quick hypervisor clock-window probe: pinned pure-CPU calibration at
2/8/32 cores, printing Mops per level and the 8->32 / 2->8 ceiling
efficiencies. Used to decide when to launch the full scaling pair
(BENCH.md protocol: launch only when 8->32 ceiling >= 0.82 on two
consecutive probes)."""
import json
import shutil
import subprocess
import sys
import time


def pinned_mops(cpus: int) -> float:
    code = (
        "import sys,json;"
        "sys.path.insert(0,'/root/repo');"
        "from tools.scaling_report import calibrate;"
        f"print(json.dumps(calibrate({cpus})))"
    )
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    return float(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    m = {c: round(pinned_mops(c), 1) for c in (2, 8, 32)}
    print(json.dumps({
        "t": time.strftime("%H:%M:%S"),
        "mops": m,
        "ceiling_2_8": round(m[8] / m[2] / 4, 3),
        "ceiling_8_32": round(m[32] / m[8] / 4, 3),
    }))
