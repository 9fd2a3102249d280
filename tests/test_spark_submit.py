"""North-rule deployment gate: the engine must run via
``spark-submit --py-files`` on a multi-executor cluster (BASELINE.json
north_rule). Launches a REAL standalone cluster (master + 2 worker JVMs,
executors as separate processes with their own heaps) on this box and
submits scripts/submit_job.py with ONLY the package zip on the path.

~60-90 s: cluster spin-up + one small end-to-end crawl.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.spark_submit_demo import run_submit


def test_spark_submit_py_files_multi_executor():
    rec = run_submit(executors=2, cores=2, mem="3g", max_pages=25)
    assert rec["ok"] is True
    assert rec["pages"] > 0
    assert rec["seen"] >= rec["pages"]
    # driver endpoint + 2 executor endpoints: the job really ran on
    # multiple executor JVMs, not local threads
    assert rec["endpoints"] >= 3
