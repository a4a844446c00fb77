"""Memory-bandwidth calibration at N cores: each worker repeatedly copies a
buffer that defeats the cache, reporting aggregate GB/s. The ALU burn in
scaling_report.calibrate captures only clock scaling; Spark shuffles and
Arrow batches are memory-bound, so THIS is the binding hardware ceiling
for the engine's 8->32 scaling on a single box (a real multi-node cluster
adds memory channels with every node)."""
import json
import shutil
import subprocess
import sys
import time


_BUFS: dict = {}


def bw_worker(_):
    """One timed pass of cache-defeating copies over per-process buffers
    (allocated once and touched on first call, so page faults are paid in
    the warm-up map, not the timed one)."""
    import numpy as np

    n_bytes = 256 * 1024 * 1024
    if not _BUFS:
        _BUFS["src"] = np.ones(n_bytes // 8, dtype=np.float64)
        _BUFS["dst"] = np.zeros(n_bytes // 8, dtype=np.float64)
    src, dst = _BUFS["src"], _BUFS["dst"]
    for _ in range(8):
        np.copyto(dst, src)
        np.copyto(src, dst)
    return True


def aggregate_bw(cpus: int) -> float:
    from multiprocessing import Pool

    n_bytes = 256 * 1024 * 1024
    with Pool(cpus) as p:
        p.map(bw_worker, range(cpus))  # warm pages
        t0 = time.perf_counter()
        p.map(bw_worker, range(cpus))
        wall = time.perf_counter() - t0
    # total traffic over the WALL time of the fully-parallel map: summing
    # self-timed per-worker rates overcounts whenever workers stagger
    return cpus * (2 * 8 * n_bytes) / wall / 1e9


def pinned(cpus: int) -> float:
    code = (
        "import sys,json;sys.path.insert(0,'/root/repo');"
        "from tools.probe_bw import aggregate_bw;"
        f"print(json.dumps(aggregate_bw({cpus})))"
    )
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    return float(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    m = {c: round(pinned(c), 1) for c in levels}
    out = {"t": time.strftime("%H:%M:%S"), "gbps": m}
    if 8 in m and 32 in m:
        out["bw_ceiling_8_32"] = round(m[32] / m[8] / 4, 3)
    if 2 in m and 8 in m:
        out["bw_ceiling_2_8"] = round(m[8] / m[2] / 4, 3)
    print(json.dumps(out))
