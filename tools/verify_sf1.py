"""sf1.0 correctness certification of the heaviest JOB queries.

VERDICT r4 missing #5: the 179.8 s sf1.0 headline run (113/113,
benchmarks/bench_sf1.json) had ZERO correctness evidence — and sf1.0 is
the only configuration exercising the device ledger, the `_STACK_MAX`
layout guard, the spill path, and the infra-degrade fallback together.
This tool runs the heaviest queries at scale 1.0 on the real chip and
verifies each result against a disk-backed sqlite oracle (the reference
verifies every timed query, tests/read_sql.cpp:1238-1242).

The in-memory SqliteOracle and the row-at-a-time plan interpreter used
at small scales are unusable here (36M-row cast_info: the Python row
loop and the :memory: load both blow past host RAM), so this tool:

* loads ONLY the tables the selected queries scan,
* streams rows into a disk-backed sqlite in 100k batches,
* indexes id/_id columns after load, and
* compares exact row multisets (NULL-safe), engine vs sqlite.

Appends a certification entry to benchmarks/CORRECTNESS.md on success.

Run (real chip): python tools/verify_sf1.py [--queries 8c,16b,...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLANS = "/root/reference/plans.json"
SQL_DIR = "/root/reference/job"

#: VERDICT r4 #3's list: the sf1.0 slowest + ledger/spill-exercising set
HEAVY = [
    "8c", "16a", "16b", "16c", "16d", "26a", "26b", "26c",
    "17b", "17c", "17e", "11c", "6f", "7a", "15d",
]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


class DiskSqliteOracle:
    """Disk-backed, subset-loading, batch-streaming variant of
    harness.oracle.SqliteOracle for scales where the in-memory loader
    does not fit (see module docstring)."""

    def __init__(self, tables, names, db_path):
        import sqlite3

        from radixjoin_tpu.harness.oracle import SqliteOracle
        from radixjoin_tpu.sql import catalog

        if os.path.exists(db_path):
            os.remove(db_path)
        self.conn = sqlite3.connect(db_path)
        self.conn.create_function(
            "like", 2, SqliteOracle._like, deterministic=True
        )
        cur = self.conn.cursor()
        cur.execute("PRAGMA journal_mode=OFF")
        cur.execute("PRAGMA synchronous=OFF")
        cur.execute("PRAGMA temp_store=FILE")
        cur.execute("PRAGMA cache_size=-524288")  # 512 MB page cache
        for name in names:
            self._load(name, tables[name], catalog)
        for name in names:
            for column, _dt in catalog.ATTRIBUTES[name]:
                if column == "id" or column.endswith("_id"):
                    t0 = time.time()
                    cur.execute(
                        f"CREATE INDEX idx_{name}_{column} "
                        f"ON {name}({column})"
                    )
                    log(f"  index {name}.{column} {time.time()-t0:.0f}s")
        self.conn.commit()

    def _load(self, name, table, catalog):
        from radixjoin_tpu.dtypes import DataType

        attrs = catalog.ATTRIBUTES[name]
        decls = []
        for (column, dtype), _col in zip(attrs, table.columns):
            sql_type = "TEXT" if dtype is DataType.VARCHAR else (
                "REAL" if dtype is DataType.FP64 else "INTEGER"
            )
            decls.append(f"{column} {sql_type}")
        cur = self.conn.cursor()
        cur.execute(f"CREATE TABLE {name} ({', '.join(decls)})")
        n = table.num_rows
        cols = table.columns
        col_objs = [
            c.objects() if c.dtype is DataType.VARCHAR else c.values
            for c in cols
        ]
        valids = [c.valid for c in cols]
        dts = [c.dtype for c in cols]
        placeholders = ", ".join(["?"] * len(cols))
        t0 = time.time()
        B = 100_000
        for lo in range(0, n, B):
            hi = min(lo + B, n)
            batch = []
            for i in range(lo, hi):
                row = []
                for dt, vals, valid in zip(dts, col_objs, valids):
                    if not valid[i]:
                        row.append(None)
                    elif dt is DataType.VARCHAR:
                        row.append(bytes(vals[i]).decode("latin-1"))
                    elif dt is DataType.FP64:
                        row.append(float(vals[i]))
                    else:
                        row.append(int(vals[i]))
                batch.append(tuple(row))
            cur.executemany(
                f"INSERT INTO {name} VALUES ({placeholders})", batch
            )
        self.conn.commit()
        log(f"  loaded {name}: {n:,} rows {time.time()-t0:.0f}s")

    def query(self, sql):
        from radixjoin_tpu.dtypes import NULL

        cur = self.conn.cursor()
        cur.execute(sql)
        out = []
        for row in cur.fetchall():
            out.append(tuple(
                NULL if v is None
                else (v.encode("latin-1") if isinstance(v, str) else v)
                for v in row
            ))
        return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--queries", default=",".join(HEAVY))
    ap.add_argument("--db", default="/root/repo/.bench_cache/oracle_sf1.db")
    ap.add_argument("--skip-engine", action="store_true",
                    help="oracle-only dry run (no TPU)")
    ap.add_argument("--platform", choices=["cpu", "default"],
                    default="default",
                    help="cpu pins the CPU backend in-Python (the axon "
                         "plugin WINS over the JAX_PLATFORMS env var and "
                         "hangs retrying a wedged tunnel)")
    args = ap.parse_args()
    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("RJT_EXEC_MODE", "shared")
        import jax

        jax.config.update("jax_platforms", "cpu")
    names = [n for n in args.queries.split(",") if n]

    from radixjoin_tpu.engine import engine_stats, execute
    from radixjoin_tpu.harness import datagen, oracle
    from radixjoin_tpu.harness.run import JobHarness, TableSource

    with open(PLANS) as f:
        all_names = json.load(f)["names"]
    queries = datagen.load_job_queries(SQL_DIR, all_names)
    t0 = time.time()
    tables = datagen.generate_cached(
        args.scale, 0, queries,
        cache_dir=os.path.join(REPO, ".bench_cache"),
    )
    log(f"datagen {time.time()-t0:.0f}s "
        f"({sum(t.num_rows for t in tables.values()):,} rows)")

    harness = JobHarness(PLANS, TableSource(host_tables=tables), SQL_DIR)
    built = {n: harness.build_plan(n) for n in names}

    # tables actually scanned by the selected queries
    needed = sorted({
        ent.table
        for n in names
        for ent in built[n][0].alias_map.values()
    })
    log(f"loading sqlite oracle ({len(needed)} tables) -> {args.db}")
    orc = DiskSqliteOracle(tables, needed, args.db)

    if not args.skip_engine:
        # wide precompile first: at sf1.0 each program's remote
        # XLA+Mosaic compile takes minutes and the compile service
        # parallelizes across requests (same rationale as bench.py
        # phase 0) — serial cold compiles would dominate the wall
        import concurrent.futures as cf

        from radixjoin_tpu.engine import precompile_fused

        t0 = time.time()
        with cf.ThreadPoolExecutor(min(8, len(names))) as ex:
            list(ex.map(
                lambda n: precompile_fused(built[n][1], harness.context),
                names,
            ))
        log(f"precompile ({len(names)} plans) {time.time()-t0:.0f}s")

    commit = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    out = os.path.join(REPO, "benchmarks", "verify_sf1.json")
    results = {}
    ok = True

    def _write():
        # incremental: every verified query is committed evidence even
        # if a later query (or the round clock) kills the process
        entry = {
            "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
            "scale": args.scale,
            "engine_commit": commit,
            "all_correct": ok,
            "queries_requested": names,
            "queries": results,
            "degradations": engine_stats(),
        }
        with open(out, "w") as f:
            json.dump(entry, f, indent=2)

    for n in names:
        parsed, plan = built[n]
        if args.skip_engine:
            continue
        t0 = time.time()
        res = execute(plan, harness.context)
        eng_s = time.time() - t0
        actual = res.to_host().to_rows()
        t0 = time.time()
        expected = orc.query(parsed.executed_sql())
        sql_s = time.time() - t0
        good, detail = oracle.rows_equal(actual, expected)
        ok &= bool(good)
        results[n] = {
            "rows": res.num_rows, "correct": bool(good),
            "engine_s": round(eng_s, 1), "sqlite_s": round(sql_s, 1),
        }
        if not good:
            results[n]["detail"] = str(detail)[:300]
        _write()
        log(f"{n:>4}: rows={res.num_rows:,} correct={good} "
            f"engine={eng_s:.1f}s sqlite={sql_s:.1f}s"
            + (f"  ({detail})" if not good else ""))

    stats = engine_stats()
    log(f"engine stats: {stats}")
    if not args.skip_engine:
        _write()
        log(f"wrote {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
