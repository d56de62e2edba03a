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

# FUSED mode, not shared: only the fused executor records per-join
# output totals (engine._fused_attempts -> plan._last_join_totals), and
# intermediate join rows are THE correlation signal — in shared mode the
# signal silently degrades to final result rows, which correlate at
# ~0.45 instead of ~0.69 (this exact failure burned two v8/v9
# calibration runs in round 5). Chunked subprocesses keep the per-
# process fused-program count under the LLVM vm.max_map_count ceiling.
os.environ["RJT_EXEC_MODE"] = "auto"


def _pin_backend(platform: str) -> None:
    """Pin the backend BEFORE first jax device use. ``cpu`` is the
    hermetic default (any host); ``default`` keeps the tunneled TPU —
    the cardinality signal is backend-independent (host-side join-total
    recording), and on the chip the 113 programs are the exact ones the
    bench already compiled, so the sweep reuses the warm export/XLA
    caches instead of paying a cold 113-program CPU compile."""
    import jax

    if platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        # persistent compile cache (CPU entries are host-microarch-
        # specific: same keying scheme as bench.py's CPU fallback) —
        # fused-mode chunks re-compile nothing on a second run
        try:
            import hashlib

            with open("/proc/cpuinfo") as _f:
                _info = [ln for ln in _f.read().splitlines()
                         if ln.startswith(("model name", "flags"))][:2]
            _fp = hashlib.sha1("\n".join(_info).encode()).hexdigest()[:10]
            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(REPO, f".jax_cache_cpu_{_fp}"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except OSError:
            pass
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)

PLANS = "/root/reference/plans.json"
SQL_DIR = "/root/reference/job"


REF_RUNTIMES = "/root/reference/benchmarks/run_b78733e.txt"


def _reference_ms():
    """Per-query runtimes of the reference's committed full-IMDB run —
    the only real-data per-query heaviness signal available offline (the
    1.2 GB IMDB dump cannot be downloaded here, so true cardinalities
    cannot be computed; runtime is the proxy the suite total is built
    from anyway, reference tests/read_sql.cpp:1243-1246)."""
    import re

    out = {}
    with open(REF_RUNTIMES) as f:
        for line in f:
            m = re.match(r"Query (\S+) >> \s*Runtime: (\d+) ms", line)
            if m:
                out[m.group(1)] = int(m.group(2))
    return out


def correlate(record_path: str) -> dict:
    """Rank-correlate the synthetic per-query result cardinalities
    against the reference's real-IMDB per-query runtimes (r2 VERDICT #7:
    are the bench's heavy queries the ones actually heavy on real
    data?). Returns the analysis dict and embeds it into the record."""
    with open(record_path) as f:
        rec = json.load(f)
    ref = _reference_ms()
    # preferred signal: total rows flowing through all joins (the work
    # the engine actually does; reference runtime is driven by
    # intermediate fan-out, not final result size — r3 VERDICT #6's
    # 0.428 Spearman was largely this signal mismatch)
    sig = rec.get("intermediate_rows") or rec["result_rows"]
    common = sorted(set(sig) & set(ref))
    rows = [sig[q] for q in common]
    ms = [ref[q] for q in common]

    def ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        r = [0.0] * len(xs)
        for pos, i in enumerate(order):
            r[i] = float(pos)
        return r

    rr, rm = ranks(rows), ranks(ms)
    n = len(common)
    mean_r, mean_m = sum(rr) / n, sum(rm) / n
    cov = sum((a - mean_r) * (b - mean_m) for a, b in zip(rr, rm))
    var_r = sum((a - mean_r) ** 2 for a in rr)
    var_m = sum((b - mean_m) ** 2 for b in rm)
    spearman = cov / (var_r * var_m) ** 0.5
    top_ref = sorted(common, key=lambda q: -ref[q])[:10]
    top_syn = sorted(common, key=lambda q: -sig[q])[:10]
    # outliers: rank difference > half the suite
    off = sorted(
        (q for a, b, q in zip(rr, rm, common) if abs(a - b) > n / 2),
        key=lambda q: -abs(rr[common.index(q)] - rm[common.index(q)]),
    )
    analysis = {
        "reference_run": REF_RUNTIMES,
        "signal": ("intermediate_join_rows"
                   if rec.get("intermediate_rows") else "result_rows"),
        "spearman_rows_vs_reference_ms": round(spearman, 3),
        "queries_compared": n,
        "top10_reference_ms": top_ref,
        "top10_synthetic_rows": top_syn,
        "top10_overlap": len(set(top_ref) & set(top_syn)),
        "rank_outliers_gt_half_suite": off,
    }
    rec["reference_correlation"] = analysis
    with open(record_path, "w") as f:
        json.dump(rec, f, indent=2, sort_keys=True)
    return analysis


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
    ap.add_argument(
        "--correlate", type=str, default=None, metavar="RECORD",
        help="rank-correlate an existing calibration record against the "
             "reference's real-IMDB per-query runtimes (no queries run)",
    )
    ap.add_argument(
        "--platform", choices=["cpu", "default"], default="cpu",
        help="default = tunneled TPU (reuses the bench's warm program "
             "caches; cardinality signal is backend-independent)",
    )
    args = ap.parse_args()

    if args.correlate:
        analysis = correlate(args.correlate)
        print(json.dumps(analysis, indent=2))
        return 0

    if args.chunk:
        return _chunked(args)
    _pin_backend(args.platform)

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
    inter = {}
    zeros = []
    for name in names:
        t0 = time.time()
        _, plan = harness.build_plan(name)
        rows = execute(plan, harness.context).num_rows
        counts[name] = rows
        # total rows flowing through all joins: the per-query WORK
        # signal (reference runtime is driven by intermediate fan-out,
        # not the final result size) — engine._fused_attempts records it
        totals = getattr(plan, "_last_join_totals", None)
        if totals is None:
            raise RuntimeError(
                f"{name}: no per-join totals — the engine did not take "
                "the fused path; the intermediate-rows signal would "
                "silently degrade to result rows"
            )
        inter[name] = sum(totals.values())
        if rows == 0:
            zeros.append(name)
        print(f"{name:>5}: {rows:>12,} rows  {inter[name]:>14,} join rows"
              f"  ({time.time()-t0:.1f}s)", flush=True)

    out = args.out or os.path.join(
        REPO, "benchmarks", f"calibration_sf{args.scale}.json"
    )
    with open(out, "w") as f:
        json.dump({
            "scale": args.scale,
            "seed": args.seed,
            "generator_version": datagen._GEN_VERSION,
            "result_rows": counts,
            "intermediate_rows": inter,
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
    merged, merged_inter, zeros = {}, {}, []
    out = args.out or os.path.join(
        REPO, "benchmarks", f"calibration_sf{args.scale}.json"
    )
    for i in range(0, len(names), args.chunk):
        part = names[i:i + args.chunk]
        cout = f"{out}.part{i}"
        cmd = [sys.executable, os.path.abspath(__file__),
               "--scale", str(args.scale), "--seed", str(args.seed),
               "--platform", args.platform,
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
        merged_inter.update(doc.get("intermediate_rows", {}))
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
            "intermediate_rows": merged_inter,
            "zero_result_queries": zeros,
            "total_rows": sum(merged.values()),
        }, f, indent=2, sort_keys=True)
    print(f"\n{len(zeros)} zero-result queries: {zeros}")
    print(f"wrote {out} ({len(merged)} queries)")
    return 1 if zeros or len(merged) < len(names) else 0


if __name__ == "__main__":
    raise SystemExit(main())
