"""Regenerate the SURVEY.md §8 implementation-status table from the live
query registry. Anchors strictly on the §8 table header line and the
``**N queries:`` stats line so no other section is ever touched (a
previous ad-hoc splice matched a §2 table separator and duplicated the
document — keep this script as the only §8 writer).

Usage: python tools/regen_survey.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY  # noqa: E402

HEADER = "| query key | check | module | summary |"
SEP = "|---|---|---|---|"


def main() -> None:
    rows = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        check = "oracle" if spec.oracle is not None else "rows-only"
        mod = spec.spark.__module__.split(".")[-1]
        first = (spec.doc or "").strip().split("\n")[0].strip()
        first = first[:70].replace("|", "/")
        rows.append(f"| `{name}` | {check} | plans/{mod} | {first} |")
    n_total = len(REGISTRY)
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)

    lines = open("SURVEY.md").read().split("\n")
    hdr_i = lines.index(HEADER)  # exactly one §8 table header
    stats_i, stats_line = next(
        (i, l) for i, l in enumerate(lines)
        if re.match(r"\*\*\d+ queries: \d+ oracle-checked", l)
    )
    assert stats_i > hdr_i
    stats_line = re.sub(
        r"\*\*\d+ queries: \d+ oracle-checked, \d+ rows-only\.\*\*",
        f"**{n_total} queries: {n_oracle} oracle-checked, "
        f"{n_total - n_oracle} rows-only.**",
        stats_line,
    )
    out = lines[:hdr_i] + [HEADER, SEP] + rows + [""] + [stats_line] + lines[stats_i + 1:]
    open("SURVEY.md", "w").write("\n".join(out))
    print(f"SURVEY.md §8: {n_total} queries ({n_oracle} oracle)")


if __name__ == "__main__":
    main()
