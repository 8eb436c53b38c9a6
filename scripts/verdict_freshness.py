#!/usr/bin/env python
"""Per-query driver-verdict freshness ledger + next rotation window.

The verify driver checks ``queries()`` in dict order with a ~50-query
budget, so only the first ~50 registry names get a fresh verdict each
round. ``registry.py::_CHECK_FIRST`` is the rotation plan; this script
replaces the hand-counted prose that used to justify it (VERDICT r9
item 6).

Folds every ``CORRECTNESS_r*.json`` into a per-query latest-verdict
ledger and prints:

  1. a freshness histogram (how many queries' latest verdict is each
     round),
  2. the staleness-ordered backfill cohort,
  3. the proposed next window: NEW (registered but never driver-checked)
     first, then the stalest cohort up to the budget.

Plan-changed queries (code changed this round, results identical) are a
judgment call the script can't see from the ledger alone — pass them
via --pin to force them into the window right after the NEW block.

Usage:
  python scripts/verdict_freshness.py [--budget 50] [--pin name ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_ledger(
    repo: str = REPO,
) -> tuple[dict[str, int], int, dict[str, int]]:
    """name -> latest GREEN round; max round seen; and the failure map.

    A verdict only counts toward freshness if it was GREEN
    (``hash_match`` true and ``err`` null) — a query that FAILED its
    latest driver check must not be recorded as freshly verified and
    sorted to the back of the rotation (ADVICE r10). The third return
    maps each name whose LATEST verdict was a failure to that round;
    ``next_window`` forces these to the very front, ahead of NEW names.
    """
    green: dict[str, int] = {}
    anyv: dict[str, int] = {}
    latest_round = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest_round = max(latest_round, rnd)
        with open(path) as f:
            for name, row in json.load(f).items():
                anyv[name] = max(anyv.get(name, 0), rnd)
                if row.get("hash_match") and not row.get("err"):
                    green[name] = max(green.get(name, 0), rnd)
    failed = {n: r for n, r in anyv.items() if r > green.get(n, 0)}
    return green, latest_round, failed


def registry_names(repo: str = REPO) -> list[str]:
    sys.path.insert(0, repo)
    from bigdata_group4_app_spark.registry import QUERY_REGISTRY

    return list(QUERY_REGISTRY)


def next_window(
    ledger: dict[str, int],
    registered: list[str],
    budget: int = 50,
    pins: list[str] | None = None,
    failed: dict[str, int] | None = None,
) -> list[str]:
    pins = pins or []
    failed = failed or {}
    order = {n: i for i, n in enumerate(registered)}
    # Latest-verdict FAILURES first — these need the re-check the most
    # (ADVICE r10: a failed check must not push a name to the back).
    fail = sorted(
        (n for n in registered if n in failed and n not in pins),
        key=lambda n: (failed[n], order[n]),
    )
    new = [
        n
        for n in registered
        if n not in ledger and n not in pins and n not in failed
    ]
    # Stalest first; ties broken by registry order for determinism.
    stale = sorted(
        (
            n
            for n in registered
            if n in ledger and n not in pins and n not in failed
        ),
        key=lambda n: (ledger[n], order[n]),
    )
    window = fail + new + [p for p in pins if p in registered] + stale
    return window[:budget]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=50)
    ap.add_argument("--pin", nargs="*", default=[])
    args = ap.parse_args()

    ledger, latest, failed = load_ledger()
    registered = registry_names()

    hist: dict[int, int] = {}
    for n in registered:
        hist[ledger.get(n, 0)] = hist.get(ledger.get(n, 0), 0) + 1
    print(f"# ledger through round {latest}; {len(registered)} registered queries")
    print("# freshness histogram (round 0 = never driver-checked; only")
    print("# GREEN verdicts count — latest-failed names listed below):")
    for rnd in sorted(hist):
        print(f"#   r{rnd}: {hist[rnd]}")
    live_failed = [n for n in registered if n in failed]
    if live_failed:
        print(f"# LATEST VERDICT FAILED ({len(live_failed)}): " + ", ".join(live_failed))

    window = next_window(ledger, registered, args.budget, args.pin, failed)
    print(f"# proposed next window ({len(window)}/{args.budget}):")
    for n in window:
        if n in failed:
            tag = f"FAILED r{failed[n]}"
        elif n not in ledger:
            tag = "NEW"
        elif n in args.pin:
            tag = "PIN"
        else:
            tag = f"r{ledger[n]}"
        print(f"{n}  # {tag}")


if __name__ == "__main__":
    main()
