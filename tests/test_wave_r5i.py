"""Semantic laws for the r5i wave: schema compatibility + dirty dates."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_schema_compat_rules(spark):
    out = (
        REGISTRY["ops_schema_evolution_compat"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("col")
    )
    assert out.loc["o_orderkey", "change"] == "widened"
    assert out.loc["o_orderkey", "backward_ok"]
    assert not out.loc["o_orderkey", "forward_ok"]
    assert out.loc["o_custkey", "change"] == "unchanged"
    assert out.loc["o_channel", "change"] == "added_default"
    assert out.loc["o_channel", "backward_ok"]
    assert out.loc["o_region", "change"] == "added_required"
    assert not out.loc["o_region", "backward_ok"]
    assert out.loc["o_comment", "change"] == "dropped"
    assert not out.loc["o_comment", "forward_ok"]
    assert out.loc["o_comment", "backward_ok"]
    # table verdict: backward broken (added_required), forward broken
    # (dropped + widenings) -> NONE
    assert (out.table_compat == "NONE").all()
    # verdict is the AND-fold of the column columns
    expect = (
        "FULL"
        if out.backward_ok.all() and out.forward_ok.all()
        else "BACKWARD"
        if out.backward_ok.all()
        else "FORWARD"
        if out.forward_ok.all()
        else "NONE"
    )
    assert out.table_compat.iloc[0] == expect


def test_dirty_dates_battery(spark):
    out = REGISTRY["fn_date_multiformat"].spark(spark, SF_DIR).toPandas()
    # only the injected garbage is unparsed
    bad = out[out.is_unparsed == 1]
    assert (bad.o_orderkey % 17 == 0).all()
    assert (bad.raw == "not-a-date").all()
    assert bad.matched_fmt.isna().all()
    # every parsed row roundtrips to the source date
    good = out[out.is_unparsed == 0]
    assert (good.roundtrip_ok == 1).all()
    # the matched format agrees with the key-modulus construction
    fmt_by_mod = {0: "iso", 1: "us", 2: "eu", 3: "compact"}
    for _, r in good.head(200).iterrows():
        assert r.matched_fmt == fmt_by_mod[r.o_orderkey % 4]
    # all four formats are exercised
    assert set(good.matched_fmt) == {"iso", "us", "eu", "compact"}
