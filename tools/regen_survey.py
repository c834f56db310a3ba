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
    try:
        hdr_i = lines.index(HEADER)  # exactly one §8 table header
    except ValueError:
        sys.exit(f"SURVEY.md §8 header not found (expected {HEADER!r}); "
                 "refusing to rewrite anything")
    # replace only the contiguous run of table rows (and the separator)
    # directly under the header — prose added after the table survives
    end_i = hdr_i + 1
    while end_i < len(lines) and (
        lines[end_i] == SEP or lines[end_i].startswith("| `")
    ):
        end_i += 1
    stats = next(
        ((i, l) for i, l in enumerate(lines)
         if re.match(r"\*\*\d+ queries: \d+ oracle-checked", l)),
        None,
    )
    if stats is None:
        sys.exit("SURVEY.md §8 stats line not found; refusing to rewrite")
    stats_i, stats_line = stats
    lines[stats_i] = re.sub(
        r"\*\*\d+ queries: \d+ oracle-checked, \d+ rows-only\.\*\*",
        f"**{n_total} queries: {n_oracle} oracle-checked, "
        f"{n_total - n_oracle} rows-only.**",
        stats_line,
    )
    out = lines[:hdr_i] + [HEADER, SEP] + rows + lines[end_i:]
    open("SURVEY.md", "w").write("\n".join(out))
    print(f"SURVEY.md §8: {n_total} queries ({n_oracle} oracle)")


if __name__ == "__main__":
    main()
