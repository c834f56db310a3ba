"""Driver-contract simulation: run every registered query against its
DuckDB oracle exactly the way the verification driver does.

This is the repo's primary end-to-end check — ``entry()`` smoke, then
per-key Spark-vs-oracle comparison (row count + schema + order-
insensitive value hash via tests/compare.assert_frames_match) at the
driver's gate scale (sf0.01 by default; sf0.001 misses float edge
cases — the round() half-up vs rint mismatch was invisible there).

Usage:
    python tools/verify_driver.py                 # full registry
    python tools/verify_driver.py dedup_ sim_     # prefix filters
    SPARK_GRAFT_VERIFY_SF=/root/testdata/sf0.001 python tools/verify_driver.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")


def main() -> int:
    prefixes = tuple(sys.argv[1:])

    import __spark_entry__ as e
    from gcp_de_data_pipeline_cc_spark.catalog import TABLES
    from gcp_de_data_pipeline_cc_spark.session import build_session
    from tests.compare import assert_frames_match

    spark = build_session(
        app_name="verify-driver", extra_conf={"spark.ui.enabled": "false"}
    )
    n_entry = len(e.entry(spark).collect())
    print(f"entry rows: {n_entry}")
    assert n_entry > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    names = [
        n for n in sorted(qs)
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    bad, n_match, n_rows_only = [], 0, 0
    t0 = time.time()
    for name in names:
        got = qs[name](spark, SF).toPandas()
        if name in oracles:
            try:
                assert_frames_match(
                    got, con.execute(oracles[name]).df(), name=name
                )
                n_match += 1
            except AssertionError as ex:
                bad.append(name)
                print(str(ex)[:400])
        else:
            n_rows_only += 1
    spark.stop()
    print(
        f"checked {len(names)} keys in {time.time() - t0:.0f}s: "
        f"{n_match} matches, {n_rows_only} rows-only, "
        f"{len(bad)} mismatches {bad}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
