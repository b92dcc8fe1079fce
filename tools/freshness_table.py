"""Regenerate the PERF.md driver-evidence freshness table.

Derives, for every query in the full inventory, the latest round whose
``CORRECTNESS_r{N}.json`` holds a fully-green row (rows + schema + hash)
and whether the query is in the CURRENT declared driver window
(``DRIVER_QUERY_ORDER``). Prints the markdown table body grouped by
(last-round, in-window), 5 queries per row, matching the PERF.md format.

Usage: python tools/freshness_table.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sample_deepbook_margin_dune_dbt_spark.queries import (  # noqa: E402
    DRIVER_QUERY_ORDER,
    FULL_QUERIES,
)


def last_green_round() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        data = json.load(open(path))
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> None:
    green = last_green_round()
    window = set(DRIVER_QUERY_ORDER)
    groups: dict[tuple[int, bool], list[str]] = {}
    for name in sorted(FULL_QUERIES):
        key = (green.get(name, 0), name in window)
        groups.setdefault(key, []).append(name)

    print("| Query | Last driver round | In current window |")
    print("|---|---|---|")
    # in-window first, then by recency desc; never-driver (0) last
    for (rnd, inw) in sorted(groups, key=lambda k: (not k[1], -k[0])):
        names = groups[(rnd, inw)]
        label = f"r{rnd}" if rnd else "never"
        for i in range(0, len(names), 5):
            chunk = " / ".join(names[i : i + 5])
            print(f"| {chunk} | {label} | {'yes' if inw else 'no'} |")


if __name__ == "__main__":
    main()
