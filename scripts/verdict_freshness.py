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


def load_ledger(repo: str = REPO) -> tuple[dict[str, int], int]:
    """name -> latest round with any driver verdict; also max round seen."""
    ledger: dict[str, int] = {}
    latest_round = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest_round = max(latest_round, rnd)
        with open(path) as f:
            for name in json.load(f):
                ledger[name] = max(ledger.get(name, 0), rnd)
    return ledger, latest_round


def registry_names(repo: str = REPO) -> list[str]:
    sys.path.insert(0, repo)
    from bigdata_group4_app_spark.registry import QUERY_REGISTRY

    return list(QUERY_REGISTRY)


def next_window(
    ledger: dict[str, int],
    registered: list[str],
    budget: int = 50,
    pins: list[str] | None = None,
) -> list[str]:
    pins = pins or []
    new = [n for n in registered if n not in ledger and n not in pins]
    # Stalest first; ties broken by registry order for determinism.
    order = {n: i for i, n in enumerate(registered)}
    stale = sorted(
        (n for n in registered if n in ledger and n not in pins),
        key=lambda n: (ledger[n], order[n]),
    )
    window = new + [p for p in pins if p in registered] + stale
    return window[:budget]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=50)
    ap.add_argument("--pin", nargs="*", default=[])
    args = ap.parse_args()

    ledger, latest = load_ledger()
    registered = registry_names()

    hist: dict[int, int] = {}
    for n in registered:
        hist[ledger.get(n, 0)] = hist.get(ledger.get(n, 0), 0) + 1
    print(f"# ledger through round {latest}; {len(registered)} registered queries")
    print("# freshness histogram (round 0 = never driver-checked):")
    for rnd in sorted(hist):
        print(f"#   r{rnd}: {hist[rnd]}")

    window = next_window(ledger, registered, args.budget, args.pin)
    print(f"# proposed next window ({len(window)}/{args.budget}):")
    for n in window:
        tag = "NEW" if n not in ledger else ("PIN" if n in args.pin else f"r{ledger[n]}")
        print(f"{n}  # {tag}")


if __name__ == "__main__":
    main()
