"""Calibration record: per-query result cardinality of the synthetic IMDB.

Runs all 113 JOB plans over the literal-aware synthetic IMDB at a given
scale (CPU backend, shape-shared engine mode) and writes
``benchmarks/calibration_sf<scale>.json`` with per-query result-row
counts. Non-empty results for every query at scale >= 0.1 is the
acceptance bar (r1 VERDICT #7: uncorrelated generation collapsed
7b/26a/26b to zero rows, letting heavy-looking queries run trivially).

Run: python tools/calibrate_datagen.py [--scale 0.1] [--queries 7b,26a]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("RJT_EXEC_MODE", "shared")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

PLANS = "/root/reference/plans.json"
SQL_DIR = "/root/reference/job"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--queries", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument(
        "--chunk", type=int, default=0,
        help="run the suite as subprocess chunks of this many queries "
             "(one CPU process cannot compile all 113 query programs: "
             "LLVM exhausts vm.max_map_count)",
    )
    args = ap.parse_args()

    if args.chunk:
        return _chunked(args)

    from radixjoin_tpu.engine import execute
    from radixjoin_tpu.harness import datagen
    from radixjoin_tpu.harness.run import JobHarness, TableSource

    with open(PLANS) as f:
        all_names = json.load(f)["names"]
    names = all_names
    if args.queries:
        names = [n for n in args.queries.split(",") if n]

    # ALWAYS harvest literals from the full suite: the generator's
    # disk-cache key includes the literal set, and the bench runs with
    # all-113 harvesting — calibrating against per-subset data would
    # measure a different database
    queries = datagen.load_job_queries(SQL_DIR, all_names)
    t0 = time.time()
    tables = datagen.generate_cached(
        args.scale, args.seed, queries,
        cache_dir=os.path.join(REPO, ".bench_cache"),
    )
    print(f"datagen {time.time()-t0:.1f}s "
          f"({sum(t.num_rows for t in tables.values())} rows)", flush=True)

    harness = JobHarness(PLANS, TableSource(host_tables=tables), SQL_DIR)
    counts = {}
    zeros = []
    for name in names:
        t0 = time.time()
        _, plan = harness.build_plan(name)
        rows = execute(plan, harness.context).num_rows
        counts[name] = rows
        if rows == 0:
            zeros.append(name)
        print(f"{name:>5}: {rows:>12,} rows  ({time.time()-t0:.1f}s)",
              flush=True)

    out = args.out or os.path.join(
        REPO, "benchmarks", f"calibration_sf{args.scale}.json"
    )
    with open(out, "w") as f:
        json.dump({
            "scale": args.scale,
            "seed": args.seed,
            "generator_version": datagen._GEN_VERSION,
            "result_rows": counts,
            "zero_result_queries": zeros,
            "total_rows": sum(counts.values()),
        }, f, indent=2, sort_keys=True)
    print(f"\n{len(zeros)} zero-result queries: {zeros}")
    print(f"wrote {out}")
    return 1 if zeros else 0


def _chunked(args):
    import subprocess

    with open(PLANS) as f:
        names = json.load(f)["names"]
    if args.queries:
        names = [n for n in args.queries.split(",") if n]
    merged, zeros = {}, []
    out = args.out or os.path.join(
        REPO, "benchmarks", f"calibration_sf{args.scale}.json"
    )
    for i in range(0, len(names), args.chunk):
        part = names[i:i + args.chunk]
        cout = f"{out}.part{i}"
        cmd = [sys.executable, os.path.abspath(__file__),
               "--scale", str(args.scale), "--seed", str(args.seed),
               "--queries", ",".join(part), "--out", cout]
        r = subprocess.run(cmd, text=True, capture_output=True)
        sys.stderr.write(r.stderr[-400:] if r.returncode not in (0, 1)
                         else "")
        if not os.path.exists(cout):
            print(f"chunk {part[0]}..{part[-1]} FAILED "
                  f"(exit {r.returncode})", flush=True)
            continue
        with open(cout) as f:
            doc = json.load(f)
        os.remove(cout)
        merged.update(doc["result_rows"])
        zeros.extend(doc["zero_result_queries"])
        print(f"chunk {part[0]}..{part[-1]}: "
              f"{sum(doc['result_rows'].values()):,} rows "
              f"({len(merged)}/{len(names)})", flush=True)
    from radixjoin_tpu.harness import datagen

    with open(out, "w") as f:
        json.dump({
            "scale": args.scale,
            "seed": args.seed,
            "generator_version": datagen._GEN_VERSION,
            "result_rows": merged,
            "zero_result_queries": zeros,
            "total_rows": sum(merged.values()),
        }, f, indent=2, sort_keys=True)
    print(f"\n{len(zeros)} zero-result queries: {zeros}")
    print(f"wrote {out} ({len(merged)} queries)")
    return 1 if zeros or len(merged) < len(names) else 0


if __name__ == "__main__":
    raise SystemExit(main())
