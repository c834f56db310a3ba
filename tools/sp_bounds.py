"""Shared SinglePartition-exchange bound classification.

Single source of truth for the domain-bound allowlist used by BOTH
``tests/test_plans_physical.py`` (the committed-artifact pin) and
``tools/sp_audit.py`` (which refuses to exit 0 when writing an artifact
containing unclassified offenders).  The round-7 failure mode — an
incremental ``sp_audit.py <prefix>`` merge landing three unclassified
2399-row calendar-spine keys without the physical suite re-running — is
structurally closed: the merge command itself now runs the exact same
classification and exits 1, printing the offenders and this file's path.

A SinglePartition exchange is scale-safe iff the rows it carries are
bounded by DOMAIN CARDINALITY (one-row totals, shuffle-partition __pid
offsets, calendar days, class labels, vocabulary types), never by data
size.  Every allowlist entry records the key's domain bound at the audit
SF with the reason beside it.
"""

from __future__ import annotations

#: keys whose SinglePartition exchanges legitimately exceed the default
#: cap — each bound is the key's DOMAIN cardinality at the audit SF,
#: with the reason beside it
SP_DOMAIN_BOUNDED: dict[str, int] = {
    # order-date day spine (2405 calendar days in the 1995-2001 range);
    # fixed by the calendar, not the data: sf0.001 -> sf0.01 moves the
    # spine 1094 -> 2399 only because the small SF doesn't fill every day
    "ts_changepoint_binseg": 2500,
    "ts_peak_detect": 2500,
    # r7 additions, same calendar-day spine class (audit profile is
    # IDENTICAL to ts_changepoint_binseg: 1094 @ sf0.001, 2399 @ sf0.01):
    # global Window.orderBy(day) lag over the daily-revenue spine
    "stats_runs_test": 2500,
    # lead/row_number over the same daily spine
    "ts_sample_entropy": 2500,
    # r9 additions, same calendar-day spine class (audit profile
    # 1093-1094 @ sf0.001, 2398-2399 @ sf0.01): KPSS residual partial
    # sums and the variance-ratio overlapping q-sum window both run
    # over the observed-day spine
    "ts_kpss": 2500,
    "ts_variance_ratio": 2500,
    # hour spine of the 30-day events window (<= 744 hours/month)
    "sli_burn_rate_alerts": 800,
    # brand/part-domain rollup (stable across SFs in the audit)
    "market_basket": 400,
    # 10 value buckets x the 30-day event-day spine
    "qc_histogram_drift": 400,
    # fixed 500-document hash-rank stratum for the LM fit (SF-stable in
    # the audit: 500 @ both sf0.001 and sf0.01 by construction)
    "corpus_perplexity_buckets": 512,
}

#: default cap: generous multiple of the 32 shuffle-partition __pid
#: offsets / scalar readouts that dominate the audited population
SP_DEFAULT_CAP = 256


def classify_offenders(audit_keys: dict[str, dict]) -> dict[str, str]:
    """Return {key: reason} for every audited key whose SinglePartition
    exchanges exceed their classified domain bound, error out, or scale
    with the data (10x input -> >3x rows, 64-row parallelism floor).
    Empty dict == the artifact is clean."""
    offenders: dict[str, str] = {}
    for key, rec in audit_keys.items():
        if any(k.startswith("err") for k in rec):
            offenders[key] = str(rec)
            continue
        hi = rec.get("max_rows_0.01", rec.get("max_rows_0.001", 0))
        lo = rec.get("max_rows_0.001", 0)
        cap = SP_DOMAIN_BOUNDED.get(key, SP_DEFAULT_CAP)
        if hi > cap:
            offenders[key] = f"max {hi} rows > cap {cap}"
        elif hi > 3 * max(lo, 64):
            offenders[key] = f"scales with data: {lo} -> {hi}"
    return offenders
