"""End-to-end JOB queries on synthetic IMDB vs two independent oracles.

Mirrors the reference's integration strategy (every query cross-checked
row-for-row against DuckDB, tests/read_sql.cpp:1224-1249) using (a) a
row-at-a-time plan interpreter and (b) sqlite running the rewritten SQL.
CI runs a representative subset; the full 113-query sweep runs in the
benchmark harness.
"""

import json

import pytest

from radixjoin_tpu.harness import datagen, oracle
from radixjoin_tpu.harness.run import JobHarness, TableSource

PLANS = "/root/reference/plans.json"
SQL_DIR = "/root/reference/job"

# spans: simple pipelines, 2x-table occurrences (movie_link), complete_cast,
# OR filters, IN lists, BETWEEN, IS NULL, big multi-join trees
CI_QUERIES = ["1a", "2a", "3b", "5c", "8d", "10c", "11a", "16b", "17e", "21a", "29a", "32a"]


@pytest.fixture(scope="module")
def setup():
    doc = json.load(open(PLANS))
    queries = datagen.load_job_queries(SQL_DIR, doc["names"])
    gen = datagen.SyntheticIMDB(scale=0.0004, seed=7, queries=queries)
    tables = gen.generate()
    source = TableSource(host_tables=tables)
    harness = JobHarness(PLANS, source, SQL_DIR)
    sqlite_oracle = oracle.SqliteOracle(tables)
    return harness, sqlite_oracle


@pytest.mark.parametrize("name", CI_QUERIES)
def test_job_query(setup, name):
    harness, sqlite_oracle = setup
    result, runtime_ms, correct, detail = harness.run_query(
        name, verify=True, sqlite_oracle=sqlite_oracle
    )
    assert correct, f"{name}: {detail}"


@pytest.mark.parametrize("env", [
    {"RJT_UNIQUE_JOIN": "auto"},
    {"RJT_CSR_JOIN": "auto"},
    {"RJT_UNIQUE_JOIN": "auto", "RJT_CSR_JOIN": "auto"},
])
@pytest.mark.parametrize("name", ["1a", "8d", "16b", "29a"])
def test_job_query_sortfree_paths(setup, monkeypatch, env, name):
    """The sort-free fast paths (dense-window scatter FK->PK join,
    host-CSR general join) are opt-in (see plan/executor.py gates); force
    them here so the oracle cross-check covers those executor paths too."""
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    harness, sqlite_oracle = setup
    result, runtime_ms, correct, detail = harness.run_query(
        name, verify=True, sqlite_oracle=sqlite_oracle
    )
    assert correct, f"{name} with {env}: {detail}"


def test_job_query_from_csv_ingest(setup, tmp_path):
    """Full CSV ingest path (reference Table::from_csv,
    build_table.cpp:135-304): the same synthetic tables written to
    reference-dialect CSVs, parsed back by the native streaming parser
    with filter pushdown, must produce identical query results."""
    from radixjoin_tpu.storage import ingest

    harness, sqlite_oracle = setup
    tables = harness.source.host_tables
    csv_dir = tmp_path / "imdb"
    csv_dir.mkdir()
    for name, table in tables.items():
        ingest.write_csv(str(csv_dir / f"{name}.csv"), table)

    csv_source = TableSource(csv_dir=str(csv_dir))
    csv_harness = JobHarness(PLANS, csv_source, SQL_DIR)
    try:
        for name in ("1a", "3b", "16b"):
            result, _, correct, detail = csv_harness.run_query(
                name, verify=True, sqlite_oracle=sqlite_oracle
            )
            assert correct, f"{name} via CSV ingest: {detail}"
    finally:
        csv_harness.close()


def test_execute_many_matches_serial(setup):
    """Batch (throughput) execution must be result-identical to per-plan
    execute(), including plans the fused compiler declines (VARCHAR join
    keys fall back inline) and cold-run overflow retries."""
    from radixjoin_tpu import execute, execute_many

    harness, _ = setup
    names = ["1a", "3b", "8d", "16b", "29a", "32a"]
    plans = [harness.build_plan(n)[1] for n in names]
    serial = [execute(p, harness.context) for p in plans]
    batch = execute_many(plans, harness.context)
    for name, a, b in zip(names, serial, batch):
        ok, msg = oracle.rows_equal(
            a.to_host().to_rows(), b.to_host().to_rows()
        )
        assert ok, f"{name}: {msg}"
