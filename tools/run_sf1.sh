#!/bin/bash
# Detached scale-1.0 full-suite bench on the real chip (VERDICT r1 #1).
# Survives the driving session: setsid + nohup, log + JSON to /tmp.
cd /root/repo
export BENCH_SCALE=1.0
export BENCH_REPEAT="${BENCH_REPEAT:-2}"
export BENCH_DEADLINE_S="${BENCH_DEADLINE_S:-10800}"
OUT="${1:-/tmp/bench_sf1_r2.json}"
LOG="${2:-/tmp/bench_sf1_r2.log}"
setsid nohup python bench.py > "$OUT" 2> "$LOG" < /dev/null &
echo "pid=$!"
