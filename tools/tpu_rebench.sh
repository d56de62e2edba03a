#!/bin/bash
# TPU-return playbook: run the full re-validation + re-bench sequence the
# moment the axon backend answers again. Designed to be launched once,
# unattended, after an outage (see .claude/skills/verify/SKILL.md).
#
#   bash tools/tpu_rebench.sh [logdir]
#
# Sequence (each step watchdogged; a step that hangs does not block the rest
# from being retried by hand):
#   1. probe jax.devices() (fail fast if the backend is still down)
#   2. verify drive: small-join + 200k FK join through the public API
#   3. headline bench sf0.01 -> benchmarks/bench_tpu_<date>.json
#   4. 10x-scale heavy-query spot bench (BENCH_SCALE=0.1, subset)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_rebench}
mkdir -p "$LOG"
STAMP=$(date +%Y%m%d_%H%M)

echo "[1/4] probe"
if ! timeout 240 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d; print(d)" \
    > "$LOG/probe.log" 2>&1; then
  echo "TPU backend still unreachable; aborting (see $LOG/probe.log)"
  exit 1
fi

echo "[2/4] verify drive"
timeout 900 python - > "$LOG/verify.log" 2>&1 <<'EOF'
import time
import numpy as np
from radixjoin_tpu import Plan, DataType, ColumnarTable, build_context, execute
from radixjoin_tpu.storage.columnar import HostTable, sorted_rows

# small join: NULL keys + VARCHAR payload + projection reorder
rows_l = [[1, b"a"], [2, b"b"], [None, b"dropme"], [2, b"c"]]
rows_r = [[2, 20], [1, 10], [3, 30], [None, 40]]
tl = HostTable.from_rows(rows_l, [DataType.INT32, DataType.VARCHAR])
tr = HostTable.from_rows(rows_r, [DataType.INT32, DataType.INT64])
plan = Plan()
sl = plan.new_scan_node(plan.new_input(ColumnarTable.from_host(tl)),
                        [(0, DataType.INT32), (1, DataType.VARCHAR)])
sr = plan.new_scan_node(plan.new_input(ColumnarTable.from_host(tr)),
                        [(0, DataType.INT32), (1, DataType.INT64)])
plan.root = plan.new_join_node(True, sl, sr, 0, 0,
                               [(3, DataType.INT64), (1, DataType.VARCHAR)])
ctx = build_context()
got = [tuple(r) for r in sorted_rows(execute(plan, ctx).to_host().to_rows())]
assert got == [(10, b"a"), (20, b"b"), (20, b"c")], got
print("small join OK")

# 200k-row FK join, cardinality cross-check
rng = np.random.default_rng(0)
n = 200_000
fk = rng.integers(0, 50_000, n)
rows_f = [[int(k), i] for i, k in enumerate(fk)]
rows_d = [[int(k), int(k) * 7] for k in range(0, 50_000, 2)]
tf = HostTable.from_rows(rows_f, [DataType.INT32, DataType.INT64])
td = HostTable.from_rows(rows_d, [DataType.INT32, DataType.INT64])
p2 = Plan()
sf = p2.new_scan_node(p2.new_input(ColumnarTable.from_host(tf)),
                      [(0, DataType.INT32), (1, DataType.INT64)])
sd = p2.new_scan_node(p2.new_input(ColumnarTable.from_host(td)),
                      [(0, DataType.INT32), (1, DataType.INT64)])
p2.root = p2.new_join_node(False, sf, sd, 0, 0,
                           [(1, DataType.INT64), (3, DataType.INT64)])
t0 = time.perf_counter()
res = execute(p2, ctx)
cold = time.perf_counter() - t0
expect = int(np.isin(fk, np.arange(0, 50_000, 2)).sum())
assert res.num_rows == expect, (res.num_rows, expect)
t0 = time.perf_counter()
res = execute(p2, ctx)
warm = time.perf_counter() - t0
print(f"FK join OK rows={res.num_rows} cold={cold*1e3:.0f}ms warm={warm*1e3:.1f}ms")
EOF
rc=$?
tail -2 "$LOG/verify.log"
[ $rc -ne 0 ] && echo "verify drive FAILED (see $LOG/verify.log)" && exit 1

echo "[3/4] headline bench sf0.01"
timeout 5000 python bench.py > "$LOG/bench_sf001.log" 2>&1
tail -1 "$LOG/bench_sf001.log" | tee "benchmarks/bench_tpu_${STAMP}_sf001.json"

echo "[4/4] 10x heavy-query spot bench"
BENCH_SCALE=0.1 BENCH_QUERIES=1a,6a,6f,8d,9d,16b,26a,26b,7b \
  BENCH_REPEAT=2 BENCH_DEADLINE_S=4800 \
  timeout 5400 python bench.py > "$LOG/bench_sf01.log" 2>&1
tail -1 "$LOG/bench_sf01.log" | tee "benchmarks/bench_tpu_${STAMP}_sf01_subset.json"

echo "done; records in benchmarks/, logs in $LOG"
