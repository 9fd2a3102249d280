"""Executor-scaling matrix on a REAL standalone cluster (north-rule shape):
run scripts/scaling_run.py at N and 4N executor JVMs (constant cores+heap per
executor) on the same corpus and git HEAD, best-of-R per point.

    python scripts/cluster_matrix.py <corpus_dir> [budget] [reps] [points]

points: comma list of ExC specs, default "2x4,8x4" (2 executors x 4 cores ->
8 executors x 4 cores: the N -> 4N pair with per-executor memory constant —
what a real cluster holds fixed and what local[N] thread-scaling cannot).

Prints one JSON line mirroring scaling_matrix.py's shape plus the cluster
geometry per point.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.standalone_cluster import StandaloneCluster  # noqa: E402


def run_once(cluster_env: dict, total_cores: int, corpus_dir: str, budget: int) -> dict:
    env = dict(os.environ, **cluster_env)
    # cluster mode: executors hold the caches; the driver only coordinates,
    # collects bounded entry rows, and hosts the DuckDB-free python side
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_run.py"),
         str(total_cores), corpus_dir, str(budget)],
        capture_output=True, text=True, timeout=5400, env=env,
    )
    if out.returncode != 0:
        print(out.stderr[-8000:], file=sys.stderr)
        raise RuntimeError(f"cluster scaling_run at {total_cores} cores failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    corpus_dir = sys.argv[1]
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    specs = (sys.argv[4] if len(sys.argv) > 4 else "2x4,8x4").split(",")
    mem = os.environ.get("SPARK_GRAFT_EXEC_MEM", "10g")
    sha = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()

    points: dict[str, dict] = {}
    for spec in specs:
        execs, cores = (int(x) for x in spec.split("x"))
        total = execs * cores
        recs = []
        # one cluster per point, fresh executor JVMs per rep (each rep is a
        # new application; standalone tears executors down with the app)
        with StandaloneCluster(execs, cores, mem) as cluster:
            for r in range(reps):
                rec = run_once(cluster.env(), total, corpus_dir, budget)
                rec["executors"] = execs
                rec["exec_cores"] = cores
                rec["exec_mem"] = mem
                recs.append(rec)
                print(
                    f"[cluster-matrix] {spec} rep={r + 1}/{reps}: "
                    f"wall={rec['wall_sec']} crawl={rec['crawl_sec']} "
                    f"distill={rec['distill_sec']} urls/s={rec['urls_per_sec']}",
                    file=sys.stderr, flush=True,
                )
        best = min(recs, key=lambda x: x["wall_sec"])
        points[spec] = {
            "walls": [x["wall_sec"] for x in recs],
            "median_wall": statistics.median(x["wall_sec"] for x in recs),
            "best": best,
        }

    out: dict = {"git": sha, "budget": budget, "reps": reps,
                 "exec_mem": mem, "points": points}
    if len(specs) >= 2:
        first, last = points[specs[0]], points[specs[-1]]
        factor = (
            last["best"]["executors"] * last["best"]["exec_cores"]
        ) / (first["best"]["executors"] * first["best"]["exec_cores"])
        out["eff_best"] = round(
            first["best"]["wall_sec"] / (factor * last["best"]["wall_sec"]), 3
        )
        out["eff_median"] = round(
            first["median_wall"] / (factor * last["median_wall"]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
