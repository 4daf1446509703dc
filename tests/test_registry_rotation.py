"""Driver-window rotation must be a pure function of the in-repo
CORRECTNESS ledger (VERDICT_r7 item #7): no hand-maintained tier list
can silently omit a query.

The driver checks the FIRST 50 exported queries.  Contract pinned here:

* no rows-only (oracle-less) query ever enters the window;
* every oracle-paired query that is unproven (never driver-checked, or
  non-green at its latest check) IS in the window;
* remaining slots fill with green queries in staleness order — every
  windowed green's last-checked round <= every non-windowed green's.
"""

from __future__ import annotations

import glob
import json
import os

from bigdatamlteamrepo_spark.queries import ORACLE, QUERIES
from bigdatamlteamrepo_spark.queries.registry import (
    ledger,
    ordered,
    window_priority,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _ledger_independent() -> dict[str, tuple[int, bool]]:
    """Re-derive the ledger here, independently of registry.ledger()."""
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[-1].split(".")[0])
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            ok = bool(
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
                and not res.get("err")
            )
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, ok)
    return latest


def test_ledger_matches_independent_parse():
    assert ledger() == _ledger_independent()


def test_window_is_function_of_ledger():
    led = _ledger_independent()
    win = list(ordered(QUERIES))[:WINDOW]

    # rows-only queries never enter the window
    assert all(n in ORACLE for n in win)

    # every unproven oracle-paired query is in the window (there are
    # fewer than WINDOW of them by construction of the rotation)
    unproven = [
        n for n in ORACLE if n not in led or not led[n][1]
    ]
    assert len(unproven) <= WINDOW
    assert set(unproven) <= set(win)

    # greens fill by staleness: max windowed round <= min excluded round
    win_green_rounds = [led[n][0] for n in win if n in led and led[n][1]]
    out_green_rounds = [
        led[n][0]
        for n in ORACLE
        if n not in win and n in led and led[n][1]
    ]
    if win_green_rounds and out_green_rounds:
        assert max(win_green_rounds) <= min(out_green_rounds)


def test_window_priority_tiers():
    led = _ledger_independent()
    # rows-only demotion
    assert window_priority("anything", has_oracle=False) == 90
    # a name absent from the ledger with an oracle is a first pick
    assert window_priority("__never_checked__", has_oracle=True) == 30
    # greens sort by round
    greens = [(n, r) for n, (r, ok) in led.items() if ok and n in ORACLE]
    for n, r in greens[:5]:
        assert window_priority(n, has_oracle=True) == 40 + r
