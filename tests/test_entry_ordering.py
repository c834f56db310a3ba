"""__spark_entry__.queries() ordering contract: the driver samples a
prefix, so never-driver-verified keys must come first, then rows-only,
then fully-passed keys; every registry key must appear exactly once."""

from __future__ import annotations

import __spark_entry__ as e
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY


def test_queries_covers_registry_exactly():
    q = e.queries()
    assert set(q) == set(REGISTRY)
    assert len(q) == len(REGISTRY)


def test_ordering_tiers_are_monotone():
    status = e._prior_verification_status()
    tiers = [status.get(n, 0) for n in e.queries()]
    assert tiers == sorted(tiers), "verified keys must sort after unverified"


def test_officially_failed_keys_sort_strictly_first():
    """A key with an official failure on record (and no later pass) must
    occupy the very front of the sampled prefix so the next official
    round closes its record (round-4 verdict task #1)."""
    status = e._prior_verification_status()
    failed = {k for k, v in status.items() if v == -1 and k in REGISTRY}
    order = list(e.queries())
    assert order[: len(failed)] == sorted(failed, key=order.index)
    # every failed key precedes every never-checked key
    if failed:
        last_failed = max(order.index(k) for k in failed)
        first_other = min(
            order.index(k) for k in order if k not in failed
        )
        assert last_failed < first_other


def test_oracle_sql_subset_of_queries():
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    # every oracle key matches the registry's oracle text
    for name, sql in o.items():
        assert REGISTRY[name].oracle == sql
