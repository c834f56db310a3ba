"""Raw→staging CSV ingest unit tests: explicit schemas, try_cast
cleansing, quarantine of dirty rows (reference readme:7-9 semantics)."""

from __future__ import annotations

import datetime as dt

import pytest

from gcp_de_data_pipeline_cc_spark.sources.csv_ingest import (
    EMPLOYEE_COLUMNS,
    EMPLOYEE_STAGING_CASTS,
    quarantine,
    raw_to_staging,
    read_landing_csv,
)


@pytest.fixture()
def landing(tmp_path):
    f = tmp_path / "Employee.csv"
    f.write_text(
        "emp_id,emp_name,dept_id,salary,hire_date\n"
        "1,  alice  ,10,100.5,2020-01-01\n"
        "2,bob,10,200.0,2021-06-15\n"
        "oops,carol,20,300.0,2022-03-01\n"   # bad emp_id → quarantine
        "4,dave,20,not_a_number,2023-01-01\n"  # bad salary, emp_id ok
    )
    return str(tmp_path)


def test_raw_tier_is_all_string(spark, landing):
    raw = read_landing_csv(spark, landing, EMPLOYEE_COLUMNS, ingest_date=dt.date(2024, 1, 1))
    assert [f.dataType.simpleString() for f in raw.schema[:-1]] == ["string"] * 5
    assert raw.count() == 4
    assert raw.columns[-1] == "ingest_date"


def test_staging_types_and_trims(spark, landing):
    raw = read_landing_csv(spark, landing, EMPLOYEE_COLUMNS, ingest_date=dt.date(2024, 1, 1))
    staged = raw_to_staging(raw, EMPLOYEE_STAGING_CASTS, required=["emp_id"])
    rows = {r.emp_id: r for r in staged.collect()}
    assert set(rows) == {1, 2, 4}  # 'oops' dropped via required emp_id
    assert rows[1].emp_name == "alice"  # trimmed
    assert rows[1].salary == 100.5
    assert rows[1].hire_date == dt.date(2020, 1, 1)
    assert rows[4].salary is None  # bad number → null, row kept


def test_quarantine_catches_bad_required_casts(spark, landing):
    raw = read_landing_csv(spark, landing, EMPLOYEE_COLUMNS, ingest_date=dt.date(2024, 1, 1))
    bad = quarantine(raw, EMPLOYEE_STAGING_CASTS, required=["emp_id", "salary"])
    ids = sorted(r.emp_name for r in bad.collect())
    assert ids == ["carol", "dave"]


def test_avro_capability_gate(spark):
    """avro_roundtrip registers iff the spark-avro datasource jar exists;
    the gate must agree with what the session can actually do."""
    from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
    from gcp_de_data_pipeline_cc_spark.plans.lifecycle import avro_available

    if avro_available():
        assert "avro_roundtrip" in REGISTRY
        out = REGISTRY["avro_roundtrip"].spark(spark, "/root/testdata/sf0.001")
        assert out.count() > 0
    else:
        assert "avro_roundtrip" not in REGISTRY
        import pytest as _pytest

        with _pytest.raises(Exception, match="[Aa]vro"):
            spark.range(1).write.format("avro").mode("overwrite").save(
                "/tmp/avro_gate_probe"
            )
