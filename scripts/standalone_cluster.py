"""Launch a real Spark standalone cluster on this box: one master + E worker
JVMs, each worker offering C cores / M memory, executors spawned as their own
JVMs with their own heaps and GC.

Why this exists: the north rule's scaling criterion is N -> 4N EXECUTORS.
``local[N]`` approximates executors with threads inside ONE JVM, which makes
the 4N point share a single heap/GC — the exact substrate term
BENCH_SCALING.md's decomposition blames for the 8->32-thread shortfall. A
standalone cluster on the same box keeps per-executor heap constant from N to
4N (executor count grows, not heap pressure per JVM), which is how a real
cluster scales. Memory bandwidth and disk are still shared — that residual is
reported, not hidden.

Uses only the pip-installed pyspark distribution: ``bin/spark-class`` +
``jars/`` (the sbin daemonizing wrappers aren't shipped, so master/worker run
as managed foreground subprocesses).

CLI (for manual experiments):
    python scripts/standalone_cluster.py start <executors> <cores> <mem>
        prints MASTER_URL, keeps running until SIGTERM/Ctrl-C
"""

from __future__ import annotations

import os
import signal
import socket
import subprocess
import sys
import tempfile
import time


def spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def _wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class StandaloneCluster:
    """Context manager: master + `executors` workers, each `cores`/`memory`.

    Workers host one executor each per application (spark.executor.cores ==
    worker cores), so `executors` IS the executor count of the app.
    """

    def __init__(self, executors: int, cores: int, memory: str,
                 work_root: str | None = None, log_dir: str | None = None):
        self.executors = executors
        self.cores = cores
        self.memory = memory
        self.work_root = work_root or tempfile.mkdtemp(prefix="spark-standalone-")
        self.log_dir = log_dir or self.work_root
        self.procs: list[subprocess.Popen] = []
        self.master_url: str | None = None

    def _spawn(self, args: list[str], log_name: str) -> subprocess.Popen:
        env = dict(os.environ)
        env["SPARK_HOME"] = spark_home()
        env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
        # daemon JVMs are tiny; executors get their heap from the app conf
        env.setdefault("SPARK_DAEMON_MEMORY", "1g")
        log = open(os.path.join(self.log_dir, log_name), "ab")
        return subprocess.Popen(
            [os.path.join(spark_home(), "bin", "spark-class"), *args],
            env=env, stdout=log, stderr=subprocess.STDOUT,
            start_new_session=True,
        )

    def __enter__(self) -> "StandaloneCluster":
        port = _free_port()
        self.master_url = f"spark://127.0.0.1:{port}"
        self.procs.append(self._spawn(
            ["org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", str(port),
             "--webui-port", str(_free_port())],
            "master.log",
        ))
        _wait_port(port)
        for i in range(self.executors):
            wd = os.path.join(self.work_root, f"worker-{i}")
            os.makedirs(wd, exist_ok=True)
            self.procs.append(self._spawn(
                ["org.apache.spark.deploy.worker.Worker",
                 "--cores", str(self.cores), "--memory", self.memory,
                 "--work-dir", wd, "--webui-port", str(_free_port()),
                 self.master_url],
                f"worker-{i}.log",
            ))
        # workers register asynchronously; the app will wait for resources,
        # but give registration a head start so the first job sees all slots
        time.sleep(3 + 0.3 * self.executors)
        return self

    def __exit__(self, *exc) -> None:
        # SIGTERM the whole process group of each daemon: a worker's
        # executors are children in its session and must die with it
        for p in reversed(self.procs):
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGTERM)
            except (ProcessLookupError, PermissionError):
                pass
        for p in reversed(self.procs):
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
        self.procs.clear()

    def env(self) -> dict[str, str]:
        """Env vars for a child driver to target this cluster via get_spark."""
        return {
            "SPARK_GRAFT_MASTER": self.master_url or "",
            "SPARK_GRAFT_EXEC_CORES": str(self.cores),
            "SPARK_GRAFT_EXEC_MEM": self.memory,
        }


def main() -> None:  # pragma: no cover - manual CLI
    if len(sys.argv) < 2 or sys.argv[1] != "start":
        print(__doc__)
        raise SystemExit(2)
    executors = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    mem = sys.argv[4] if len(sys.argv) > 4 else "10g"
    with StandaloneCluster(executors, cores, mem) as c:
        print(c.master_url, flush=True)
        try:
            signal.pause()
        except KeyboardInterrupt:
            pass


if __name__ == "__main__":
    main()
