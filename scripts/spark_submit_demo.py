"""North-rule deployment demonstration: the engine submitted to a REAL
multi-executor Spark standalone cluster via ``spark-submit --py-files``.

    python scripts/spark_submit_demo.py [executors cores mem max_pages]

What this proves (and tests/test_spark_submit.py gates):
  1. ``session.package_zip()`` produces a self-contained shipment — the job
     (scripts/submit_job.py) imports web2llmstxt_spark on driver and
     executors with the repo NOT on any PYTHONPATH, only ``--py-files``.
  2. The crawl engine runs unmodified under spark-submit against executor
     JVMs that are separate processes with their own heaps (the north
     rule's cluster shape), not local[N] threads.

Prints the job's single JSON line on success.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.standalone_cluster import StandaloneCluster, spark_home  # noqa: E402
from web2llmstxt_spark.session import package_zip  # noqa: E402


def run_submit(executors: int = 2, cores: int = 2, mem: str = "3g",
               max_pages: int = 25, timeout: int = 600) -> dict:
    import json

    zip_path = package_zip()
    with StandaloneCluster(executors, cores, mem) as cluster:
        env = dict(os.environ)
        env["SPARK_HOME"] = spark_home()
        env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
        # executors must run the driver's interpreter (pandas/pyarrow travel
        # with it); PYTHONPATH deliberately NOT set — only --py-files ships
        # the package
        env["PYSPARK_PYTHON"] = sys.executable
        env.pop("PYTHONPATH", None)
        out = subprocess.run(
            [
                os.path.join(spark_home(), "bin", "spark-submit"),
                "--master", cluster.master_url,
                "--py-files", zip_path,
                "--conf", f"spark.executor.cores={cores}",
                "--conf", f"spark.executor.memory={mem}",
                "--conf", f"spark.cores.max={executors * cores}",
                "--conf", "spark.sql.shuffle.partitions="
                          f"{max(8, executors * cores * 2)}",
                os.path.join(REPO, "scripts", "submit_job.py"),
                str(max_pages),
            ],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=spark_home(),  # NOT the repo: import must come from the zip
        )
    if out.returncode != 0:
        raise RuntimeError(
            f"spark-submit failed rc={out.returncode}\n{out.stderr[-6000:]}"
        )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    import json

    executors = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mem = sys.argv[3] if len(sys.argv) > 3 else "3g"
    max_pages = int(sys.argv[4]) if len(sys.argv) > 4 else 25
    rec = run_submit(executors, cores, mem, max_pages)
    print(json.dumps(rec))
    if not rec.get("ok") or rec.get("endpoints", 0) < executors + 1:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
