"""Ad-hoc single-key differential runner for development iterations.

Usage: python tools/diffcheck.py key1 key2 ...  [--sf /root/testdata/sf0.01]

Runs each registry key on Spark and (when oracle-paired) on DuckDB over
the same warehouse and applies tests/compare.assert_frames_match — the
same check the pytest differential suite parametrizes, without spinning
the whole suite. Prints PASS/FAIL per key.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from gcp_de_data_pipeline_cc_spark.catalog import TABLES  # noqa: E402
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY  # noqa: E402
from gcp_de_data_pipeline_cc_spark.session import build_session  # noqa: E402
from tests.compare import assert_frames_match  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    args, skip = [], False
    for a in sys.argv[1:]:
        if skip:
            sf_dir = a
            skip = False
        elif a == "--sf":
            skip = True
        elif not a.startswith("--"):
            args.append(a)
    keys = args or sorted(REGISTRY)
    spark = build_session(
        app_name="diffcheck",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failed = []
    for name in keys:
        spec = REGISTRY[name]
        try:
            got = spec.spark(spark, sf_dir).toPandas()
            if spec.oracle is None:
                print(f"ROWS-ONLY {name}: {len(got)} rows, cols={list(got.columns)}")
                continue
            want = duck.execute(spec.oracle).df()
            assert_frames_match(got, want, name=name)
            print(f"PASS {name}: {len(got)} rows")
        except Exception:
            failed.append(name)
            print(f"FAIL {name}")
            traceback.print_exc(limit=8)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
