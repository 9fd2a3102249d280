"""Sharded parallel corpus generation for the scaling benchmarks.

Hosts are self-contained link graphs (no cross-host links in the fast
corpus), so sharding generation by host range is exact: W workers each emit
a disjoint host slice into ``site_pages.parquet/part-<w>.parquet`` under one
dataset directory, and the union is byte-for-byte the same SET of rows a
single-process run would produce (row order across shards differs; nothing
in the engine depends on input row order).

Usage:
  python scripts/gen_corpus_parallel.py <out_dir> <n_hosts> <pages_per_host> \
      [out_links=40] [sent_lo=10] [sent_hi=28] [workers=8] [seed=1234] [mode=fast]

mode=cf writes the closed-form corpus (sources/cfcorpus.py) instead: same
schema, but every page is a pure function of (seed, host, i), enabling the
O(candidates) ClosedFormFetcher. cf shards share ONE global seed (the page
function is position-keyed); sent_lo/sent_hi are fixed 5..14 in cf.

MEMORY: each worker holds its whole shard as Python lists before the one
pyarrow write — budget ~6-7 GB per 10^6 pages per worker and do NOT run
while a large-heap Spark JVM is up (8 workers x 1.6M pages alongside a 48g
JVM OOM-killed both on the 125 GB sandbox box).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER_SNIPPET = """
import json, sys
(seed, n_hosts, pph, links, out_dir, lo, hi, off, w, mode) = json.loads(sys.argv[1])
if mode == "cf":
    from web2llmstxt_spark.sources.cfcorpus import generate_corpus_cf
    m = generate_corpus_cf(
        seed=seed, n_hosts=n_hosts, pages_per_host=pph, out_links=links,
        out_dir=out_dir, host_offset=off,
        out_name=f"site_pages.parquet/part-{w:03d}.parquet", write_meta=False,
    )
else:
    from web2llmstxt_spark.sources.corpus import generate_corpus_fast
    m = generate_corpus_fast(
        seed=seed + off, n_hosts=n_hosts, pages_per_host=pph, out_links=links,
        out_dir=out_dir, sentences=(lo, hi), host_offset=off,
        out_name=f"site_pages.parquet/part-{w:03d}.parquet", write_meta=False,
    )
print(json.dumps({"n_pages": m["n_pages"], "seeds": m["seeds"]}))
"""


def main() -> None:
    out_dir = sys.argv[1]
    n_hosts = int(sys.argv[2])
    pph = int(sys.argv[3])
    links = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    lo = int(sys.argv[5]) if len(sys.argv) > 5 else 10
    hi = int(sys.argv[6]) if len(sys.argv) > 6 else 28
    workers = int(sys.argv[7]) if len(sys.argv) > 7 else 8
    seed = int(sys.argv[8]) if len(sys.argv) > 8 else 1234
    mode = sys.argv[9] if len(sys.argv) > 9 else "fast"

    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    # split hosts into contiguous ranges (host index -> host name, so ranges
    # must be disjoint; remainder spread over the first shards)
    base, rem = divmod(n_hosts, workers)
    procs = []
    off = 0
    for w in range(workers):
        nh = base + (1 if w < rem else 0)
        if nh == 0:
            continue
        args = json.dumps([seed, nh, pph, links, out_dir, lo, hi, off, w, mode])
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER_SNIPPET, args],
                stdout=subprocess.PIPE, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        )
        off += nh
    total, seeds = 0, []
    for p in procs:
        out, _ = p.communicate()
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}")
        m = json.loads(out.strip().splitlines()[-1])
        total += m["n_pages"]
        seeds.extend(m["seeds"])
    meta = {"n_pages": total, "seeds": sorted(seeds)}
    if mode == "cf":
        meta["cf"] = {"seed": seed, "n_hosts": n_hosts, "pages_per_host": pph,
                      "out_links": links, "host_offset": 0}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps({"n_pages": total, "n_seeds": len(seeds),
                      "sec": round(time.time() - t0, 1), "path": out_dir}))


if __name__ == "__main__":
    main()
