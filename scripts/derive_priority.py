"""Re-derive ``queries/__init__._PRIORITY`` from CORRECTNESS_r*.json.

The driver samples the FIRST 50 entries of ``queries()`` each round.  The
rotation invariant (pinned by tests/test_registry.py::
test_priority_rotation_is_fresh) is: no query inside the sample may have a
fresher latest-green driver round than any query outside it.  This script
prints the full ordering — never-sampled queries first, then ascending
latest-green round, name order within a cohort — ready to paste into the
``_PRIORITY`` tuple.  Run it at the START of every round, after any
``CORRECTNESS_r{N}.json`` lands, and again after registering new queries.

Usage::

    python scripts/derive_priority.py          # print the tuple body
    python scripts/derive_priority.py --stats  # cohort histogram only
    python scripts/derive_priority.py --write  # rewrite the _PRIORITY
                                               # tuple in queries/__init__.py
                                               # in place (comments above
                                               # the tuple are preserved)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green_row(row: dict) -> bool:
    """THE green predicate — single source of truth, imported by
    tests/test_registry.py::test_priority_rotation_is_fresh so the
    derivation and the tripwire can never disagree (round-12 advice:
    the two previously diverged on explicit ``"hash_match": null`` and
    empty-string ``err`` rows).  Green means: value-hash match, or —
    for queries with no oracle SQL (the driver emits no hash there) —
    a rows-only match with no error recorded."""
    return row.get("hash_match") is True or (
        row.get("hash_match") is None
        and row.get("rows_match") is True
        and not row.get("err")
    )


def latest_green_rounds() -> dict[str, int]:
    """query name -> latest driver round with a hash-green row.

    Queries listed in ``queries.VERIFICATION_DEBT`` (implementation
    restructured after their latest green — the old green verified a
    plan that no longer exists) are reset to 0, i.e. stalest, so the
    next sample re-verifies them first (r13 verdict item 1b)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if green_row(row):
                latest[name] = max(latest.get(name, 0), rnd)
    sys.path.insert(0, REPO)
    from gov_data_pipeline_spark.queries import VERIFICATION_DEBT

    for name in VERIFICATION_DEBT:
        latest.pop(name, None)
    return latest


def main() -> None:
    sys.path.insert(0, REPO)
    from gov_data_pipeline_spark.queries import all_queries

    greens = latest_green_rounds()
    names = list(all_queries())
    # sort key: (latest green round, name); never-green sorts first (round 0)
    ordered = sorted(names, key=lambda n: (greens.get(n, 0), n))

    if "--stats" in sys.argv:
        from collections import Counter

        hist = Counter(greens.get(n, 0) for n in names)
        for rnd in sorted(hist):
            label = "never" if rnd == 0 else f"r{rnd:02d}"
            print(f"{label}: {hist[rnd]}")
        boundary = ordered[49] if len(ordered) > 49 else ordered[-1]
        print(f"sample boundary (pos 50): {boundary} (r{greens.get(boundary, 0):02d})")
        return

    lines = []
    prev_rnd = None
    for name in ordered:
        rnd = greens.get(name, 0)
        if rnd != prev_rnd:
            label = "never sampled (no driver row)" if rnd == 0 else f"latest green r{rnd:02d}"
            lines.append(f"    # {label}")
            prev_rnd = rnd
        lines.append(f'    "{name}",')
    body = "\n".join(lines) + "\n"

    if "--write" in sys.argv:
        path = os.path.join(
            REPO, "gov_data_pipeline_spark", "queries", "__init__.py"
        )
        src = open(path).read()
        start = src.index("_PRIORITY: tuple[str, ...] = (")
        end = src.index("\n)\n", start) + len("\n)\n")
        open(path, "w").write(
            src[:start] + "_PRIORITY: tuple[str, ...] = (\n" + body + ")\n"
            + src[end:]
        )
        print(f"wrote {len(ordered)} names to {path}")
        return

    print(body, end="")


if __name__ == "__main__":
    main()
