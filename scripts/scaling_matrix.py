"""Same-code best-of-N scaling matrix (the round-3 verdict's gate protocol):
run scripts/scaling_run.py REPS times at EACH core count on the SAME corpus
and the SAME git HEAD, report every rep plus best-of, and the efficiency
computed from the best-of pair. No mixed-code ratios: every number in the
output comes from the single engine version this script was launched under.

Usage:
  python scripts/scaling_matrix.py <corpus_dir> [budget] [reps] [cores,cores,...]

Prints one JSON line:
  {"git": sha, "budget": B, "reps": R,
   "points": {"8": {"walls": [...], "best": {...full best-rep record...}}, ...},
   "eff_best": eff(first->last, best-of), "eff_median": ...}

Reps run back-to-back (sequential — concurrent JVMs would contend for cores
and poison the measurement); each rep is a fresh subprocess/JVM so no state
leaks between reps.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, corpus_dir: str, budget: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_run.py"),
         str(cores), corpus_dir, str(budget)],
        capture_output=True, text=True, timeout=5400, env=env,
    )
    if out.returncode != 0:
        print(out.stderr[-8000:], file=sys.stderr)
        raise RuntimeError(f"scaling_run at {cores} cores failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    corpus_dir = sys.argv[1]
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cores_list = (
        [int(c) for c in sys.argv[4].split(",")] if len(sys.argv) > 4 else [8, 32]
    )
    sha = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()

    points: dict[str, dict] = {}
    for cores in cores_list:
        recs = []
        for r in range(reps):
            rec = run_once(cores, corpus_dir, budget)
            recs.append(rec)
            print(f"[matrix] cores={cores} rep={r + 1}/{reps}: "
                  f"wall={rec['wall_sec']} crawl={rec['crawl_sec']} "
                  f"distill={rec['distill_sec']} urls/s={rec['urls_per_sec']}",
                  file=sys.stderr)
        best = min(recs, key=lambda x: x["wall_sec"])
        points[str(cores)] = {
            "walls": [x["wall_sec"] for x in recs],
            "crawls": [x["crawl_sec"] for x in recs],
            "distills": [x["distill_sec"] for x in recs],
            "best": best,
            "median_wall": statistics.median(x["wall_sec"] for x in recs),
        }

    lo, hi = str(cores_list[0]), str(cores_list[-1])
    ratio = cores_list[-1] / cores_list[0]
    eff_best = points[lo]["best"]["wall_sec"] / (ratio * points[hi]["best"]["wall_sec"])
    eff_median = points[lo]["median_wall"] / (ratio * points[hi]["median_wall"])
    print(json.dumps({
        "git": sha, "budget": budget, "reps": reps, "points": points,
        "eff_best": round(eff_best, 3), "eff_median": round(eff_median, 3),
    }))


if __name__ == "__main__":
    main()
