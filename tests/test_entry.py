"""Driver-contract invariants on __spark_entry__ — cheap guards that
catch a broken gate window (typo'd name, duplicate, rows-only query in a
hash-checked slot, oracle drift) before the driver does. No Spark
session needed: these run on the registry alone."""

import importlib.util
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# rows-only by design (no oracle): must never occupy a gate slot
_ROWS_ONLY = {"q_bpe_merges", "q_dedup_semantic_scale", "q_sequence_pack_ffd"}


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_window_is_50_unique_hash_checkable():
    mod = _entry()
    queries = mod.queries()
    oracles = mod.oracle_sql()
    window = list(queries)[:50]
    assert len(set(window)) == 50
    # every gate slot has an oracle (the driver hash-compares all 50)
    missing = [n for n in window if n not in oracles]
    assert not missing, f"gate slots without oracle SQL: {missing}"
    assert not (_ROWS_ONLY & set(window))


def test_gate_first_names_all_resolve():
    mod = _entry()
    queries = mod.queries()
    unknown = [n for n in mod._GATE_FIRST if n not in queries]
    assert not unknown, f"_GATE_FIRST names not in registry: {unknown}"
    assert len(mod._GATE_FIRST) == len(set(mod._GATE_FIRST))


def test_registry_and_oracle_consistency():
    mod = _entry()
    queries = mod.queries()
    oracles = mod.oracle_sql()
    # oracles only for declared queries; rows-only set is exactly the
    # declared-minus-oracle complement
    assert set(oracles) <= set(queries)
    assert set(queries) - set(oracles) == _ROWS_ONLY


def test_failed_gate_rows_count_as_never_gated():
    """A FAILED driver gate row must NOT advance a query's staleness —
    otherwise a red row rotates out of the window for ~3 rounds and the
    fix is never re-checked by the hard signal (round-13 verdict
    'What's wrong' #2: q_spj_merge failed r13's hash gate and must lead
    the r14 window)."""
    import sys

    sys.path.insert(0, os.path.join(_ROOT, "scripts"))
    from gate_rotation import last_gate_rounds, rotation_window

    # q_spj_merge's only gate row (r13) failed its hash check, so its
    # last PASSING round is 0 = never gated green...
    last = last_gate_rounds(_ROOT, before_round=14)
    assert last.get("q_spj_merge", 0) == 0
    # ...and never-gated queries lead the window.
    assert rotation_window(50, _ROOT, before_round=14)[0] == "q_spj_merge"


def test_gate_window_is_stalest_first():
    """_GATE_FIRST must equal the stalest-first rotation recomputed
    from the CORRECTNESS_r*.json history strictly before _GATE_ROUND —
    the documented policy (never-gated first, then oldest gate row,
    ties by registry declaration order). Keeps the hand-pasted tuple
    in lockstep with scripts/gate_rotation.py."""
    import sys

    sys.path.insert(0, os.path.join(_ROOT, "scripts"))
    from gate_rotation import rotation_window

    mod = _entry()
    want = rotation_window(50, _ROOT, before_round=mod._GATE_ROUND)
    assert list(mod._GATE_FIRST) == want, (
        "gate window drifted from stalest-first policy; regenerate with "
        "scripts/gate_rotation.py"
    )
