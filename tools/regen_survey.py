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

    # --- §8 prose header + denominators (r8 verdict task #5): stamp
    # round number and the §2 row census so the prose can never drift
    # from the regenerated table again ---
    import glob

    rounds = [
        int(m.group(1))
        for p in glob.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"r(\d+)\.json$", p))
    ]
    cur_round = (max(rounds) + 1) if rounds else 1
    # census of §2: count operator rows (| `...`-style table rows)
    # per 2.x subsection between "## 2." and "## 3."
    sec2_counts: dict[str, int] = {}
    cur_sec = None
    in_sec2 = False
    for line in out:
        if line.startswith("## 2."):
            in_sec2 = True
            continue
        if line.startswith("## 3."):
            break
        if not in_sec2:
            continue
        m = re.match(r"### (2\.\d+)", line)
        if m:
            cur_sec = m.group(1)
            continue
        if cur_sec and line.startswith("|") and not line.startswith(
            ("|---", "| # |", "| op", "| id", "| query key")
        ):
            sec2_counts[cur_sec] = sec2_counts.get(cur_sec, 0) + 1
    core = sum(
        sec2_counts.get(f"2.{i}", 0) for i in range(1, 12)
    )
    ext = "; ".join(
        f"§2.{i}: {sec2_counts[f'2.{i}']}"
        for i in range(12, 100)
        if f"2.{i}" in sec2_counts
    )
    n_rows = core + sum(
        v for k, v in sec2_counts.items()
        if int(k.split(".")[1]) >= 12
    )
    for i, line in enumerate(out):
        if line.startswith("## 8. Implementation status"):
            out[i] = f"## 8. Implementation status (round {cur_round})"
            # the denominator paragraph is the next non-empty block
            j = i + 2
            if j < len(out) and out[j].startswith("§2 now enumerates"):
                k = j
                while k < len(out) and out[k].strip():
                    k += 1
                out[j:k] = [
                    f"§2 now enumerates {n_rows} operator rows "
                    f"(§2.1–§2.11 core: {core}; {ext}) —",
                    "the coverage denominator the table below realizes "
                    "key by key.",
                ]
            break

    open("SURVEY.md", "w").write("\n".join(out))
    print(
        f"SURVEY.md §8: {n_total} queries ({n_oracle} oracle); "
        f"§2 census {n_rows} rows (core {core}); round {cur_round}"
    )


if __name__ == "__main__":
    main()
