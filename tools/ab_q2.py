"""Interleaved code-parity A/B for bench q2 (synthetic-fixture extraction).

Round-5 left one open perf question: q2 calm captures read 19.8-21.3 s vs
r4's 18.8 s, under VM throttle noise. This tool answers it the round-4
way: check the baseline commit out into a git worktree, then run q2 ALONE
under the IDENTICAL r5 measurement protocol (persisted fixture, fresh
JVM per run) strictly interleaved A B A B ... inside one session, so any
hypervisor drift hits both sides equally. Reports per-run seconds and
medians.

Usage: python tools/ab_q2.py [baseline_commit] [reps] [--keep]

The baseline checkout under .abwork/<commit> is torn down after the A/B
completes (pass --keep to retain it for a follow-up run) — a stale 20k-LoC
worktree corrupts naive LoC/copy audits of the repo.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_BASELINE = "0295a40"  # round-4 final state
SF = 0.1

_PROTOCOL = r"""
import json, sys, time
tree = sys.argv[1]
sys.path.insert(0, tree)
from doctr_spark.session import get_spark
from doctr_spark.fixtures.transcripts import generate_transcripts, n_convs_for_sf
from doctr_spark.operators.pipeline import extract_documents

spark = get_spark(master="local[32]", app_name="ab_q2", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
extract_documents(generate_transcripts(spark, 20)).count()  # warm codegen/Arrow
tdf = generate_transcripts(spark, n_convs_for_sf(%f)).persist()
tdf.count()
t0 = time.perf_counter()
n = extract_documents(tdf).count()
dt = time.perf_counter() - t0
tdf.unpersist(blocking=True)
spark.stop()
print(json.dumps({"sec": round(dt, 3), "turns": n}))
""" % SF


def _ensure_worktree(commit: str) -> str:
    path = os.path.join(REPO, ".abwork", commit)
    if not os.path.isdir(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", path, commit],
            check=True,
            capture_output=True,
        )
    return path


def run_once(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _PROTOCOL, tree],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=tree,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def _teardown_worktree(commit: str) -> None:
    path = os.path.join(REPO, ".abwork", commit)
    if os.path.isdir(path):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", path],
            check=False,
            capture_output=True,
        )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--keep"]
    keep = "--keep" in sys.argv[1:]
    commit = args[0] if args else DEFAULT_BASELINE
    reps = int(args[1]) if len(args) > 1 else 3
    base_tree = _ensure_worktree(commit)
    sides = {"baseline": base_tree, "head": REPO}
    results: dict[str, list[float]] = {k: [] for k in sides}
    try:
        for i in range(reps):
            for name, tree in sides.items():
                r = run_once(tree)
                results[name].append(r["sec"])
                print(json.dumps({"rep": i, "side": name, **r}), flush=True)
    finally:
        if not keep:
            _teardown_worktree(commit)
    summary = {
        name: {
            "runs": vals,
            "median": round(statistics.median(vals), 3),
            "min": round(min(vals), 3),
        }
        for name, vals in results.items()
    }
    summary["head_vs_baseline_median"] = round(
        summary["head"]["median"] / summary["baseline"]["median"], 3
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
