#!/usr/bin/env python
"""Benchmark: full 113-query JOB suite on synthetic IMDB, one device.

Mirrors the reference's benchmark protocol (tests/read_sql.cpp:1251-1333):
per-query timing covers ``execute()`` only (plan construction and base-table
filtering excluded); the metric is the suite total. The real 1.2 GB IMDB
dump is not available in this environment, so the suite runs on the
literal-aware synthetic IMDB (harness/datagen.py) at BENCH_SCALE
(default 0.1 = 10% of real row counts — a compute-dominated scale;
VERDICT r3 #9: at sf0.01 the ~28 ms/query tunnel round trip was 94% of
the metric, measuring the link, not the engine). A secondary sf0.01
serial pass rides in ``detail.secondary`` for trend continuity with
rounds 1-3. The reference baseline of 914,223 ms was measured on the
full dataset on a 96-core Threadripper, so ``vs_baseline`` is reported
against a row-count-scaled baseline (baseline_total * scale) — an
approximation, recorded for trend tracking.

Env knobs: BENCH_SCALE, BENCH_SECONDARY_SCALE (default 0.01, "" = off),
BENCH_QUERIES (comma list), BENCH_REPEAT.
Prints exactly one JSON line on stdout.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PLANS = "/root/reference/plans.json"
SQL_DIR = "/root/reference/job"
BASELINE_TOTAL_MS = 914_223.0  # BASELINE.md: JOB 113-query total, 7995WX
#: one default for main() AND the crash-path emitter (ADVICE r4: the
#: crash path used '0.01' while main() ran 0.1, so a crash with
#: BENCH_SCALE unset emitted a 10x-wrong vs_baseline)
DEFAULT_SCALE = "0.1"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmRSS"):
                    return int(ln.split()[1]) / (1 << 20)
    except OSError:
        pass
    return -1.0


def _mem_snapshot(tag: str) -> None:
    """Attribute host-RSS growth (VERDICT r4 #5: sf1.0 grew ~15-20 GB
    per warmup phase into the OOM killer, owner unknown). Python-heap
    bytes (tracemalloc) vs anonymous RSS (smaps_rollup) splits the
    suspects: python-side retention (results, feedback, export blobs)
    shows in both; native growth (tunnel-client buffer shadows, XLA
    lowering arenas) shows only in anon. Opt-in: BENCH_RSS_PROFILE=1."""
    if os.environ.get("BENCH_RSS_PROFILE") != "1":
        return
    import gc
    import tracemalloc

    gc.collect()
    anon = rss = -1
    try:
        with open("/proc/self/smaps_rollup") as f:
            for ln in f:
                if ln.startswith("Anonymous:"):
                    anon = int(ln.split()[1]) >> 10  # MB
                elif ln.startswith("Rss:"):
                    rss = int(ln.split()[1]) >> 10
    except OSError:
        pass
    if not tracemalloc.is_tracing():
        tracemalloc.start(10)
        log(f"bench[mem] {tag}: rss={rss}MB anon={anon}MB "
            f"(tracemalloc now on)")
        return
    cur, peak = tracemalloc.get_traced_memory()
    top = tracemalloc.take_snapshot().statistics("lineno")[:5]
    log(f"bench[mem] {tag}: rss={rss}MB anon={anon}MB "
        f"pyheap={cur >> 20}MB (peak {peak >> 20}MB) "
        f"native~={max(0, anon - (cur >> 10) // 1024)}MB")
    for st in top:
        log(f"bench[mem]   {st}")


_partial = {"per_query": {}, "stage": "init", "result_rows": 0,
            "backend": "unknown", "stage_totals": {}}


def _emit(total_ms, scale, n_queries, partial=False):
    scaled_baseline = BASELINE_TOTAL_MS * scale
    detail = {
        "queries": n_queries,
        "result_rows": int(_partial["result_rows"]),
        "scaled_baseline_ms": round(scaled_baseline, 1),
        "backend": _partial["backend"],
        "slowest": sorted(
            _partial["per_query"].items(), key=lambda kv: -kv[1]
        )[:5],
    }
    if "batch_wall_ms" in _partial:
        detail["batch_wall_ms"] = _partial["batch_wall_ms"]
    if "phase_times" in _partial:
        detail["warmup_phase_s"] = _partial["phase_times"]
    if "secondary" in _partial:
        detail["secondary"] = _partial["secondary"]
    if _partial["stage_totals"]:
        # suite-wide stage split (best pass): how much of the serial
        # total is program dispatch vs result fetch (the tunnel's ~27 ms
        # RPC floor rides in fetch_ms) vs host decode — VERDICT r1 #9
        detail["stage_split_ms"] = {
            k: round(v, 1) for k, v in _partial["stage_totals"].items()
        }
    if "device_ms" in _partial:
        detail["device_ms"] = _partial["device_ms"]
    # degradation tallies (VERDICT r4 #6): a record must show whether
    # its queries ran on-chip or via host fallback, and why. The
    # headline number is the PRIMARY-pass snapshot (taken right after
    # the timed passes); later phases (device-ms, batch, secondary)
    # tally into the process-wide stats, reported separately when they
    # differ so a secondary-phase infra flake cannot masquerade as a
    # degraded primary (observed 2026-08-21: two remote-compile flakes
    # during the sf0.01 secondary warmup showed up in the sf0.1 record).
    try:
        from radixjoin_tpu.engine import engine_stats

        now = engine_stats()
        snap = _partial.get("degradations_primary")
        detail["degradations"] = snap if snap is not None else now
        if snap is not None and snap != now:
            detail["degradations_process"] = now
    except Exception:  # noqa: BLE001 - emit must never fail
        pass
    if partial:
        detail["partial"] = f"watchdog fired during {_partial['stage']}"
    print(json.dumps({
        "metric": f"job113_synthetic_sf{scale}_total_ms",
        "value": round(total_ms, 2),
        "unit": "ms",
        "vs_baseline": round(scaled_baseline / total_ms, 3) if total_ms else 0.0,
        "detail": detail,
    }), flush=True)


def _arm_watchdog(scale, n_queries):
    """The tunneled TPU backend intermittently stalls executions for
    minutes to hours (see memory/ARCHITECTURE notes, 2026-08-17). If the
    suite cannot finish inside BENCH_DEADLINE_S (default 55 min), emit
    whatever was measured as an explicitly-partial result instead of
    hanging until the driver kills us with nothing recorded."""
    import threading

    deadline = float(os.environ.get("BENCH_DEADLINE_S", "3300"))

    def fire():
        timed = {
            k: v for k, v in _partial["per_query"].items() if v is not None
        }
        log(f"bench: WATCHDOG after {deadline:.0f}s in stage "
            f"'{_partial['stage']}' ({len(timed)}/{n_queries} queries timed)")
        total = sum(timed.values())
        if _partial["stage"] in ("batch", "secondary", "device-ms"):
            # the headline serial protocol finished completely; only a
            # bonus stage stalled — emit the full result, drop that
            # stage's detail, and exit clean
            _partial.pop("batch_wall_ms", None)
            if _partial["stage"] == "secondary":
                _partial.pop("secondary", None)
            if _partial["stage"] == "device-ms":
                _partial.pop("device_ms", None)
            _emit(total, scale, len(timed))
            os._exit(0)
        _emit(total if timed else 0.0, scale, len(timed), partial=True)
        os._exit(3)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


def _ensure_backend() -> str:
    """Probe the default (tunneled TPU) backend in a subprocess with a hard
    timeout; fall back to the CPU backend when it is unreachable.

    The axon service intermittently degrades to init hangs or
    ``UNAVAILABLE`` errors (observed 2026-08-17: ``jax.devices()`` blocks
    >20 min). Without this guard a dead backend turns the whole bench run
    into a watchdog zero; with it the driver still records a real (slower,
    explicitly-flagged) CPU measurement. The probe runs in a subprocess
    because the hang happens inside backend init, which cannot be
    interrupted in-process."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return "cpu"
    if not os.environ.get("BENCH_FORCE_CPU"):
        import subprocess

        probe_s = float(os.environ.get("BENCH_TPU_PROBE_S", "240"))
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                timeout=probe_s, capture_output=True, text=True,
            )
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip().splitlines()[-1]
            log(f"bench: backend probe failed (exit {r.returncode}): "
                f"{(r.stderr or '')[-400:]}")
        except subprocess.TimeoutExpired:
            log(f"bench: backend probe hung >{probe_s:.0f}s")
    log("bench: TPU unreachable -> CPU fallback "
        "(shape-shared mode, batch stage off)")
    jax.config.update("jax_platforms", "cpu")
    # CPU AOT cache entries are host-microarch-specific: entries written
    # by a different machine SIGSEGV when loaded (the repo disk persists
    # across heterogeneous hosts), so key the cache dir by a CPU
    # fingerprint instead of sharing one directory
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            info = [ln for ln in f.read().splitlines()
                    if ln.startswith(("model name", "flags"))][:2]
        fp = hashlib.sha1("\n".join(info).encode()).hexdigest()[:10]
    except OSError:
        fp = "unknown"
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, f".jax_cache_cpu_{fp}"))
    # shape-shared kernels: a handful of programs instead of one per
    # query — the CPU backend's LLVM JIT hits vm.max_map_count past a few
    # hundred distinct programs in one process
    os.environ.setdefault("RJT_EXEC_MODE", "shared")
    os.environ.setdefault("BENCH_BATCH", "off")
    return "cpu-fallback"


def _cpu_chunked(names, scale):
    """Run the suite as subprocess chunks on the CPU fallback backend.

    One CPU process cannot execute the whole 113-query suite: the LLVM
    JIT exhausts vm.max_map_count past a few hundred distinct programs
    (observed as 'LLVM compilation error: Cannot allocate memory' then
    SIGSEGV) even in shape-shared mode once per-query feedback shapes
    pile up. Each chunk child emits its own JSON line; this parent
    aggregates them into the single driver line."""
    import subprocess

    chunk = int(os.environ.get("BENCH_CPU_CHUNK", "16"))
    env = dict(os.environ)
    env["BENCH_FORCE_CPU"] = "1"
    env["BENCH_CPU_CHILD"] = "1"
    env.pop("JAX_PLATFORMS", None)
    deadline = time.monotonic() + float(
        os.environ.get("BENCH_DEADLINE_S", "3300")) - 120
    total_ms = 0.0
    done = 0
    for i in range(0, len(names), chunk):
        part = names[i:i + chunk]
        env["BENCH_QUERIES"] = ",".join(part)
        budget = deadline - time.monotonic()
        if budget < 60:
            log(f"bench: chunk budget exhausted at {done}/{len(names)}")
            break
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=budget,
            )
        except subprocess.TimeoutExpired:
            log(f"bench: chunk {part[0]}..{part[-1]} timed out")
            break
        line = next(
            (ln for ln in reversed(r.stdout.splitlines())
             if ln.startswith("{")), None)
        if r.returncode != 0 or line is None:
            log(f"bench: chunk {part[0]}..{part[-1]} failed "
                f"(exit {r.returncode}): {(r.stderr or '')[-600:]}")
            continue
        res = json.loads(line)
        d = res["detail"]
        total_ms += res["value"]
        done += d["queries"]
        _partial["result_rows"] += d["result_rows"]
        for name, ms in d["slowest"]:
            _partial["per_query"][name] = ms
        log(f"bench: chunk {part[0]}..{part[-1]}: {res['value']:.1f} ms "
            f"({done}/{len(names)} queries)")
    _emit(total_ms, scale, done, partial=done < len(names))


def _secondary_pass(scale: float, names, harness_cls, source_cls, datagen,
                    execute) -> dict:
    """One warm serial pass at a secondary scale (sf0.01 trend line for
    rounds 1-3 comparability). Precompile + one warm execute each, then
    one timed pass; returns the summary dict for ``detail.secondary``."""
    import concurrent.futures as cf

    from radixjoin_tpu import engine as _eng

    try:
        _stats_before = _eng.engine_stats()
    except Exception:  # noqa: BLE001
        _stats_before = None
    t0 = time.perf_counter()
    queries = datagen.load_job_queries(SQL_DIR, names)
    tables = datagen.generate_cached(
        scale, 0, queries, cache_dir=os.path.join(REPO, ".bench_cache")
    )
    source = source_cls(host_tables=tables)
    harness = harness_cls(PLANS, source, SQL_DIR)
    plans = {n: harness.build_plan(n)[1] for n in names}
    log(f"bench: secondary sf{scale} setup {time.perf_counter()-t0:.1f}s")

    def warm(name):
        try:
            _eng.precompile_fused(plans[name], harness.context)
            # TWO warm executions: the first rides the AOT executable,
            # the second pays the jitted wrapper's one-time
            # trace+load so the timed pass below hits the C++ fast
            # path (run2's secondary measured the jit first-call cost,
            # ~7 s/query, instead of the engine)
            execute(plans[name], harness.context)
            execute(plans[name], harness.context)
        except Exception as e:  # noqa: BLE001
            log(f"bench: secondary warm[{name}] failed: "
                f"{type(e).__name__}: {str(e)[:120]}")

    t0 = time.perf_counter()
    # 24-wide: the secondary scale is small by design, and first-run
    # executable finalization overlaps across threads (see warm_default)
    with cf.ThreadPoolExecutor(24) as ex:
        list(ex.map(warm, names))
    warm_s = time.perf_counter() - t0
    per = {}
    for name in names:
        t0 = time.perf_counter()
        execute(plans[name], harness.context)
        per[name] = (time.perf_counter() - t0) * 1e3
    total = sum(per.values())
    scaled_baseline = BASELINE_TOTAL_MS * scale
    out = {
        "scale": scale,
        "total_ms": round(total, 2),
        "vs_baseline": round(scaled_baseline / total, 3) if total else 0.0,
        "warmup_s": round(warm_s, 1),
    }
    # secondary-phase degradation delta (see _emit): counters that moved
    # during THIS phase belong in the secondary dict, not the primary's
    before = _stats_before
    if before is not None:
        after = _eng.engine_stats()
        delta = {k: after[k] - before.get(k, 0)
                 for k in after if isinstance(after[k], int)}
        if any(delta.values()):
            out["degradations"] = {
                k: v for k, v in delta.items() if v
            }
            out["degradations"]["queries"] = {
                k: [q for q in after["queries"].get(k, [])
                    if q not in before.get("queries", {}).get(k, [])]
                for k, v in delta.items() if v
            }
    return out


def main():
    scale = float(os.environ.get("BENCH_SCALE", DEFAULT_SCALE))
    repeat = int(os.environ.get("BENCH_REPEAT", "2"))

    from radixjoin_tpu.harness import datagen
    from radixjoin_tpu.harness.run import JobHarness, TableSource

    with open(PLANS) as f:
        names_all = json.load(f)["names"]
    names = names_all
    if os.environ.get("BENCH_QUERIES"):
        names = [n for n in os.environ["BENCH_QUERIES"].split(",") if n]

    _arm_watchdog(scale, len(names))
    _partial["backend"] = _ensure_backend()
    if (_partial["backend"] == "cpu-fallback"
            and not os.environ.get("BENCH_CPU_CHILD")):
        return _cpu_chunked(names, scale)
    log(f"bench: devices={jax.devices()} scale={scale} queries={len(names)}")
    _partial["stage"] = "datagen"
    t0 = time.perf_counter()
    queries = datagen.load_job_queries(SQL_DIR, names_all)
    tables = datagen.generate_cached(
        scale, 0, queries, cache_dir=os.path.join(REPO, ".bench_cache")
    )
    log(f"bench: synthetic IMDB generated in {time.perf_counter()-t0:.1f}s "
        f"({sum(t.num_rows for t in tables.values())} rows)")
    _mem_snapshot("datagen")

    source = TableSource(host_tables=tables)
    harness = JobHarness(PLANS, source, SQL_DIR)

    # Pre-build plans once (filter eval + page encode are harness-side,
    # excluded from timing like the reference's CSV/plan phase).
    plans = {}
    _partial["stage"] = "plan build"
    t0 = time.perf_counter()
    for name in names:
        plans[name] = harness.build_plan(name)[1]
    log(f"bench: {len(names)} plans built in {time.perf_counter()-t0:.1f}s")

    from radixjoin_tpu.engine import execute

    # Staged cold-start warmup (VERDICT r3 #4: 142 s precompile + 936 s
    # warmup because the precompiled executables were thrown away and the
    # warmup's SECOND executions compiled feedback-specialized shapes
    # phase-0 never saw). Now:
    #   0a. wide precompile of the initial-state programs — the AOT
    #       executables are RETAINED (plan/fused.py compiled_plan) and
    #       the execute path calls them directly;
    #   0b. one execute per query (learns cardinality feedback);
    #   0c. wide precompile of the feedback-specialized programs (only
    #       queries whose state changed compile anything new);
    #   0d. one more execute per query = the steady-state shape.
    # Each phase logs elapsed + the slowest plans so a regression is
    # attributable to a phase, not a 936 s blob.
    # Warmup width: first execution of each program pays a service-side
    # executable finalization on the tunnel (~1-100 s/program, device
    # idle) which overlaps across threads — 24-wide cut exec1 from
    # 322 s to 36 s at sf0.1 (measured 2026-08-21). At sf>=0.5 stay
    # narrow: each in-flight execute pins full-scale result buffers and
    # the wide pool drove host RSS into the OOM killer (bench_sf1
    # attempt r9).
    warm_default = "24" if scale < 0.5 else "6"
    warm_threads = int(os.environ.get("BENCH_WARMUP_THREADS", warm_default))
    if warm_threads > 0:
        import concurrent.futures as cf

        from radixjoin_tpu import engine as _eng

        pre_threads = int(os.environ.get("BENCH_PRECOMPILE_THREADS", "24"))
        phase_times = {}

        def _run_phase(tag, threads, fn):
            _partial["stage"] = tag
            t_p = time.perf_counter()
            times = {}

            def timed(name):
                t0 = time.perf_counter()
                try:
                    fn(name)
                except Exception as e:  # noqa: BLE001 - best-effort
                    log(f"bench: {tag}[{name}] failed: "
                        f"{type(e).__name__}: {str(e)[:150]}")
                times[name] = time.perf_counter() - t0

            with cf.ThreadPoolExecutor(threads) as ex:
                list(ex.map(timed, names))
            dt = time.perf_counter() - t_p
            phase_times[tag] = round(dt, 1)
            slow = sorted(times.items(), key=lambda kv: -kv[1])[:5]
            log(f"bench: {tag} ({threads} threads) took {dt:.1f}s; "
                f"rss={_rss_gb():.1f}GB; slowest: "
                + ", ".join(f"{n}={s:.1f}s" for n, s in slow))
            _mem_snapshot(tag)

        def precompile(name):
            _eng.precompile_fused(plans[name], harness.context)

        rows_by_name = {}

        def warm1(name):
            rows_by_name[name] = execute(
                plans[name], harness.context
            ).num_rows
            _partial["result_rows"] += rows_by_name[name]

        def warm2(name):
            execute(plans[name], harness.context)

        import gc

        from radixjoin_tpu.plan import fused as _fzc

        def _drop_aot(tag):
            # AOT executables are only needed for each structure's FIRST
            # execution (the jitted wrapper takes over after) — their
            # host-side serialized binaries are ~100s of MB each for
            # sf1.0 programs, and retaining all of them drove host RSS
            # into the OOM killer (attempt r9: 88 GB after
            # precompile-feedback, killed mid-exec2). Only dropped at
            # big scales: re-loading an executable re-pays the
            # service-side first-run finalization, which poisoned the
            # sf0.1 device-ms pass (13a showed 10.6 s of "device time"
            # that was really executable re-load after the drop).
            if scale < 0.5:
                return
            _fzc._compiled_exec.cache_clear()
            gc.collect()
            log(f"bench: {tag}: AOT cache dropped; rss={_rss_gb():.1f}GB")

        if pre_threads > 0:
            _run_phase("precompile", pre_threads, precompile)
        _run_phase("warmup-exec1", warm_threads, warm1)
        _drop_aot("post-exec1")
        if pre_threads > 0:
            _run_phase("precompile-feedback", pre_threads, precompile)
        _run_phase("warmup-exec2", warm_threads, warm2)
        _drop_aot("post-exec2")
        _partial["phase_times"] = phase_times

    per_query = _partial["per_query"]
    for it in range(max(1, repeat)):
        _partial["stage"] = f"pass {it}"
        t_iter = time.perf_counter()
        stage_totals: dict = {}
        for qi, name in enumerate(names):
            if qi % 20 == 0 and float(
                os.environ.get("BENCH_SCALE", DEFAULT_SCALE)
            ) >= 0.5:
                log(f"bench: pass {it} q{qi} rss={_rss_gb():.1f}GB")
            t0 = time.perf_counter()
            result = execute(plans[name], harness.context)
            dt = (time.perf_counter() - t0) * 1e3
            prev = per_query.get(name)
            per_query[name] = dt if prev is None else min(prev, dt)
            for k, v in (getattr(plans[name], "_last_exec_stats", None)
                         or {}).items():
                if isinstance(v, (int, float)):
                    stage_totals[k] = stage_totals.get(k, 0.0) + v
            if it == 0 and warm_threads <= 0:
                _partial["result_rows"] += result.num_rows
        if not _partial["stage_totals"] or (
            sum(v for k, v in stage_totals.items() if k.endswith("_ms"))
            < sum(v for k, v in _partial["stage_totals"].items()
                  if k.endswith("_ms"))
        ):
            _partial["stage_totals"] = stage_totals
        log(f"bench: pass {it} took {time.perf_counter()-t_iter:.1f}s; "
            f"rss={_rss_gb():.1f}GB")
        _mem_snapshot(f"pass {it}")

    # snapshot the degradation tallies attributable to the warmup +
    # timed passes, before the bonus phases run more queries (see _emit)
    try:
        from radixjoin_tpu.engine import engine_stats

        _partial["degradations_primary"] = engine_stats()
    except Exception:  # noqa: BLE001
        pass

    # Device-time pass (VERDICT r4 #7): per-query device execution time,
    # measured by fetching the 8-byte join totals ALONE (dispatch->ready
    # wall time) and subtracting the measured RPC floor; payload
    # transfer rides a separate fetch. Non-headline pass — the split
    # costs one extra round trip per query, so the serial protocol above
    # never pays it.
    if (os.environ.get("BENCH_DEVICE_MS", "on") != "off"
            and _partial["backend"] not in ("cpu", "cpu-fallback")):
        _partial["stage"] = "device-ms"
        try:
            from radixjoin_tpu.harness import devtime

            floor = devtime.measure_floor_ms()
            os.environ["RJT_DEVICE_SYNC"] = "1"
            dev_ms = {}
            for name in names:
                execute(plans[name], harness.context)
                st = getattr(plans[name], "_last_exec_stats", None) or {}
                if "device_sync_ms" in st:
                    dev_ms[name] = max(0.0, st["device_sync_ms"] - floor)
            _partial["device_ms"] = {
                "floor_ms": round(floor, 2),
                "total_ms": round(sum(dev_ms.values()), 1),
                "queries_measured": len(dev_ms),
                "slowest": sorted(
                    ((n, round(v, 2)) for n, v in dev_ms.items()),
                    key=lambda kv: -kv[1],
                )[:5],
            }
            log(f"bench: device-ms total {sum(dev_ms.values()):.1f} ms "
                f"over {len(dev_ms)} queries (floor {floor:.1f} ms)")
        except Exception as e:  # noqa: BLE001 - bonus measurement
            log(f"bench: device-ms pass failed ({type(e).__name__}: "
                f"{str(e)[:160]})")
        finally:
            os.environ.pop("RJT_DEVICE_SYNC", None)

    # Bonus record: the same suite as ONE execute_many() batch
    # (overlapped dispatch + host transfers). Reported in `detail` only —
    # the headline metric stays the reference's serial per-query
    # protocol (read_sql.cpp:1234-1236).
    if os.environ.get("BENCH_BATCH", "on") != "off":
        from radixjoin_tpu.engine import execute_many

        _partial["stage"] = "batch"
        batch_best = None
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                execute_many([plans[n] for n in names], harness.context)
                dt = (time.perf_counter() - t0) * 1e3
                batch_best = dt if batch_best is None else min(batch_best, dt)
            _partial["batch_wall_ms"] = round(batch_best, 2)
            log(f"bench: batch wall-clock {batch_best:.1f} ms")
        except Exception as e:  # noqa: BLE001
            # the batch stage is a bonus measurement: at scale 1.0 the
            # one-program whole-suite batch can exhaust HBM — the serial
            # protocol (the headline) already finished, so report it
            # (observed 2026-08-19: RESOURCE_EXHAUSTED after both serial
            # passes killed the run with nothing emitted)
            log(f"bench: batch stage failed ({type(e).__name__}: "
                f"{str(e)[:200]}), reporting serial result only")

    # Secondary scale (default sf0.01): one warm serial pass for trend
    # continuity with rounds 1-3 (VERDICT r3 #9 moved the primary to a
    # compute-dominated scale).
    sec = os.environ.get("BENCH_SECONDARY_SCALE", "0.01")
    if sec and float(sec) != scale and not os.environ.get("BENCH_QUERIES"):
        _partial["stage"] = "secondary"
        try:
            _partial["secondary"] = _secondary_pass(
                float(sec), names, JobHarness, TableSource, datagen, execute
            )
            log(f"bench: secondary {_partial['secondary']}")
        except Exception as e:  # noqa: BLE001
            log(f"bench: secondary pass failed ({type(e).__name__}: "
                f"{str(e)[:200]}); primary result unaffected")

    _partial["stage"] = "done"
    from radixjoin_tpu.plan import executor as _ex
    from radixjoin_tpu.plan import fused as _fz

    log(f"bench: join paths wave={_ex.path_stats()} fused={_fz.path_stats()}")
    for name, _ in sorted(per_query.items(), key=lambda kv: -kv[1])[:3]:
        st = getattr(plans[name], "_last_exec_stats", None)
        if st:
            log(f"bench: {name} stage breakdown {st}")
    _emit(sum(per_query.values()), scale, len(names))


def _main_guarded():
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # never die without a metric line: whatever was timed so far is
        # the result (partial-flagged) — a crash after the serial passes
        # must not discard an hour of measurement
        import traceback

        traceback.print_exc(file=sys.stderr)
        timed = {k: v for k, v in _partial["per_query"].items()
                 if v is not None}
        log(f"bench: CRASH in stage '{_partial['stage']}' with "
            f"{len(timed)} queries timed: {type(e).__name__}")
        # a crash during/after a bonus stage doesn't taint the completed
        # serial protocol
        complete = _partial["stage"] in (
            "batch", "secondary", "device-ms", "done"
        )
        _emit(sum(timed.values()),
              float(os.environ.get("BENCH_SCALE", DEFAULT_SCALE)),
              len(timed), partial=not complete)
        sys.exit(0 if complete else 4)


if __name__ == "__main__":
    _main_guarded()
