"""Compute the driver-gate rotation window: the 50 hash-checkable
queries whose last driver-gate row (CORRECTNESS_r*.json) is oldest,
never-gated first, ties broken by registry declaration order.

This is the single source of truth for `__spark_entry__._GATE_FIRST`
(the policy is documented there): run this after a round's
CORRECTNESS_r{N}.json lands, paste the printed tuple into
`_GATE_FIRST`, and `tests/test_entry.py::test_gate_window_is_stalest_first`
keeps the two in lockstep. With 168 hash-checkable queries and a
50-slot window, every query gets a driver row at least once every
ceil(168/50) = 4 rounds; the per-round ORACLE_SWEEP covers the rest.

Usage:  python scripts/gate_rotation.py [--window 50]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _row_passed(row: dict) -> bool:
    """A gate row counts as 'gated' only when it PASSED — a FAILED row
    must re-enter the window immediately (round-13 verdict: q_spj_merge
    failed r13's gate and the old any-row rule would have rotated it OUT
    for ~3 rounds, leaving the fix unverifiable by the hard signal)."""
    return (
        not row.get("err")
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
    )


def last_gate_rounds(root: str = _ROOT, before_round: int | None = None) -> dict[str, int]:
    """query name -> latest round with a PASSING CORRECTNESS_r*.json row
    (0 = never gated green; failed-only history counts as never).

    ``before_round``: only count history strictly before this round —
    the window for round N is computed from rounds < N, so the check
    stays deterministic even after the driver writes round N's own
    CORRECTNESS file."""
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        if before_round is not None and rnd >= before_round:
            continue
        try:
            rows = json.load(open(p))
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _row_passed(row):
                last[name] = max(last.get(name, 0), rnd)
    return last


def rotation_window(
    window: int = 50, root: str = _ROOT, before_round: int | None = None
) -> list[str]:
    """The stalest-first gate window over hash-checkable registry queries."""
    sys.path.insert(0, root)
    from ray_beam_runner_spark.queries import ORACLE, QUERIES

    last = last_gate_rounds(root, before_round)
    order = {n: i for i, n in enumerate(QUERIES)}
    checkable = [n for n in QUERIES if n in ORACLE]
    return sorted(checkable, key=lambda n: (last.get(n, 0), order[n]))[:window]


if __name__ == "__main__":
    n = 50
    if "--window" in sys.argv:
        n = int(sys.argv[sys.argv.index("--window") + 1])
    win = rotation_window(n)
    last = last_gate_rounds()
    print("_GATE_FIRST = (")
    for name in win:
        rnd = last.get(name, 0)
        print(f'    "{name}",  # last gated {"never" if not rnd else f"r{rnd}"}')
    print(")")
