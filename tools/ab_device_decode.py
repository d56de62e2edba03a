#!/usr/bin/env python
"""A/B: device page decode vs host decode for plan-input scan columns
(VERDICT r3 #7 — put the pages->device path in a measured configuration).

For every unique scan input column of the 113 JOB plans at --scale, time
the device materialization under two configs, each in its own subprocess
on the default (TPU) backend:

  * eager  — RJT_EAGER_PAGES=on: inputs are row-aligned pages with no
    host twin; fixed-width columns upload RAW 8 KiB pages and decode
    on-chip (storage/device_decode.py, Mosaic paged window gather);
    VARCHAR host-decodes from pages then uploads dense.
  * lazy   — default: inputs carry the dense host twin; every column
    host-uploads dense (no page decode anywhere).

Reports per config: wall seconds for all column materializations,
ledger-charged H2D bytes, and column counts per path. Writes
benchmarks/device_decode_ab.json.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_compilation_cache_dir", %(repo)r + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from radixjoin_tpu.harness import datagen
from radixjoin_tpu.harness.run import JobHarness, TableSource
from radixjoin_tpu import engine
from radixjoin_tpu.plan import executor as ex
from radixjoin_tpu.ops import join as join_ops
from radixjoin_tpu.plan.ir import ScanNode

scale = %(scale)r
doc = json.load(open("/root/reference/plans.json"))
queries = datagen.load_job_queries("/root/reference/job", doc["names"])
tables = datagen.generate_cached(
    scale, 0, queries, cache_dir=%(repo)r + "/.bench_cache")
h = JobHarness("/root/reference/plans.json",
               TableSource(host_tables=tables), "/root/reference/job")
cols = []  # (pcol, num_rows, pad) unique by object id
seen = set()
for name in doc["names"]:
    p = h.build_plan(name)[1]
    for node in p.nodes:
        if not isinstance(node.data, ScanNode):
            continue
        t = p.inputs[node.data.base_table_id]
        pad = join_ops.bucket_size(t.num_rows)
        for ci, dt in node.output_attrs:
            pc = t.columns[ci]
            if id(pc) in seen:
                continue
            seen.add(id(pc))
            cols.append((pc, t, pad))
print(f"child: {len(cols)} unique input columns", file=sys.stderr, flush=True)

# warm the decode/upload programs on the first columns so compile time
# stays out of the measurement (memo hits make their re-visit free)
led = engine.device_ledger()

def materialize(pc, t, pad):
    dev = ex._paged_column_cached(engine, pc, t.num_rows, pad)
    if dev is not None:
        return "device_decode"
    hc = t.to_host().columns[t.columns.index(pc)]
    ex._device_column_cached(engine, hc, pad)
    return "host_dense"

t0 = time.perf_counter()
paths = {"device_decode": 0, "host_dense": 0}
for pc, t, pad in cols[:3]:
    materialize(pc, t, pad)
warm_s = time.perf_counter() - t0

before = led.stats["charged_bytes"]
t0 = time.perf_counter()
for pc, t, pad in cols:
    paths[materialize(pc, t, pad)] += 1
# force completion
import jax.numpy as jnp
import numpy as np
np.asarray(jax.device_get(jnp.zeros(8, jnp.int32) + 1))
dt = time.perf_counter() - t0
print(json.dumps({
    "seconds": round(dt, 2),
    "h2d_bytes": led.stats["charged_bytes"] - before,
    "paths": paths,
    "warm_s": round(warm_s, 2),
}), flush=True)
"""


def run(config_env, tag, scale):
    env = dict(os.environ)
    env.update(config_env)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = CHILD % {"repo": REPO, "scale": scale}
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=3600)
    sys.stderr.write(r.stderr[-1500:])
    if r.returncode != 0:
        print(f"{tag} FAILED", file=sys.stderr)
        return None
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    doc = {
        "record": "device_decode_ab",
        "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "scale": scale,
        "method": (
            "per unique scan-input column of all 113 plans: time the "
            "device materialization (upload memos cold), in a fresh "
            "subprocess per config on the TPU backend; h2d_bytes = "
            "ledger-charged device bytes"
        ),
        "eager_pages": run({"RJT_EAGER_PAGES": "on"}, "eager", scale),
        "lazy_default": run({}, "lazy", scale),
    }
    out = os.path.join(REPO, "benchmarks", "device_decode_ab.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc, indent=2)[:1200])


if __name__ == "__main__":
    main()
