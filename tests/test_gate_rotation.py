"""Gate-rotation pinning (VERDICT r10 ask #2).

The driver certifies only the first 50 names of ``queries()`` per round,
so the committed ``_GATE_PRIORITY`` must rotate staleness-first.  Through
round 10 the order was hand-built; these tests pin it to the generator in
``scripts/gen_gate_priority.py`` so a hand edit (or a forgotten rotation)
that would let any registry entry exceed 3 rounds of staleness fails in
CI rather than in the judge's cross-round union.
"""

from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

from gen_gate_priority import WINDOW, certified_rounds, generate  # noqa: E402

from swiftlake_spark.queries import (  # noqa: E402
    _GATE_PRIORITY,
    _GATE_TIER2,
    REGISTRY,
    _load_all,
)


@pytest.fixture(scope="module")
def state():
    _load_all()
    return list(REGISTRY), certified_rounds()


def test_committed_window_matches_generator(state):
    """The first 50 committed names are exactly the generated order.

    Two committed states are legal (VERDICT r11 ask #3): the window
    generated from the FULL CORRECTNESS union (post-regeneration, the
    normal in-session state), or the window generated from the union
    EXCLUDING the newest round — the state the previous session committed
    against, which is what the judge sees the moment the driver drops a
    new CORRECTNESS file after the session ends.  Anything older than one
    generation of lag is a genuine forgotten rotation and hard-fails.
    """
    names, certified = state
    got = list(_GATE_PRIORITY)[:WINDOW]
    want_now = generate(names, certified, _GATE_TIER2)[:WINDOW]
    if got == want_now:
        return
    prev = certified_rounds(exclude_newest=True)
    want_prev = generate(names, prev, _GATE_TIER2)[:WINDOW]
    assert got == want_prev, (
        "committed _GATE_PRIORITY window diverged from "
        "scripts/gen_gate_priority.py by more than one round of lag — "
        "regenerate and commit"
    )


def test_boundary_block_heads_window(state):
    """Every query at the (tier-adjusted) staleness boundary is inside
    the driver window.

    Like the generator-match test, the boundary may be computed against
    the full union or the union excluding the newest round (rotation
    pending at handoff) — one generation of lag is legal, more is not.
    """
    names, certified = state
    window = set(list(_GATE_PRIORITY)[:WINDOW])

    def missing_for(cert):
        known = [n for n in names if n in cert]

        def eff(n):
            return cert[n][0] + (1 if n in _GATE_TIER2 else 0)

        boundary_round = min(eff(n) for n in known)
        boundary = {n for n in known if eff(n) == boundary_round}
        return boundary_round, boundary - window

    boundary_round, missing = missing_for(certified)
    if missing:
        # One generation of lag is legal ONLY if (a) the previous union's
        # boundary is satisfied AND (b) regeneration would put every
        # violating name inside the next window — i.e. the lag is exactly
        # one generation, not a policy hole (ADVICE r12: the prev-union
        # check alone accepted windows that never catch up).
        _, missing_prev = missing_for(certified_rounds(exclude_newest=True))
        assert not missing_prev, (
            f"stale-boundary queries (effective r{boundary_round}) outside "
            f"the 50-slot window: {sorted(missing)}"
        )
        regen = set(generate(names, certified, _GATE_TIER2)[:WINDOW])
        uncaught = missing - regen
        assert not uncaught, (
            f"stale-boundary queries outside the committed window that "
            f"regeneration would NOT catch either: {sorted(uncaught)} — "
            "the rotation policy itself is broken, not just lagging"
        )


def test_hash_red_never_counts_as_certification(tmp_path):
    """A hash_match:false record on an oracle-bearing query must not
    advance its last-green round (VERDICT r12 ask #1 pinning test).

    The r12 bug: certified_rounds() credited rows_match && err==None as
    green even when the driver recorded hash_match=false for a query
    that HAS an oracle — so driver-red q121 rotated out of the window
    for ~3 rounds instead of heading the next one.
    """
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q_with_oracle": {"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None},
        "q_rows_only": {"rows_match": True, "schema_match": True,
                        "hash_match": False, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        # the r12 q121 shape: rows/schema green, hash RED, no error
        "q_with_oracle": {"rows_match": True, "schema_match": True,
                          "hash_match": False, "err": None},
        "q_rows_only": {"rows_match": True, "schema_match": True,
                        "hash_match": False, "err": None},
    }))
    cert = certified_rounds(
        repo=str(tmp_path), oracle_names=frozenset({"q_with_oracle"})
    )
    # oracle-bearing: hash-red r2 must NOT advance last-green past r1
    assert cert["q_with_oracle"][0] == 1, (
        "hash-red record advanced an oracle-bearing query's last-green round"
    )
    # oracle-less: rows-only fallback still applies
    assert cert["q_rows_only"][0] == 2


def test_generator_uses_registry_oracles(state):
    """The default oracle_names set is derived from the live registry, and
    the r12 failure mode is structurally closed: a query with an oracle is
    green only via hash_match."""
    from gen_gate_priority import _oracle_names

    names, certified = state
    oracles = _oracle_names()
    assert "q121_merge_into" in oracles
    # Under the tightened criterion q121's r12 hash-red record can never
    # be its last-green round (it was r9 at the r13 fix; later rounds may
    # re-certify it, but r12 stays permanently red).
    assert certified["q121_merge_into"][0] != 12


def test_window_names_are_registered(state):
    names, certified = state
    unknown = [n for n in _GATE_PRIORITY if n not in set(names)]
    assert not unknown, f"_GATE_PRIORITY names not in REGISTRY: {unknown}"


def test_registry_size_keeps_invariant_feasible(state):
    """Two-tier capacity: each tier-1 query consumes a window slot at
    least every 3 rounds, each tier-2 every 4 — feasible iff
    N1/3 + N2/4 <= window (ratified r12, VERDICT r11 ask #4)."""
    names, _ = state
    n2 = sum(1 for n in names if n in _GATE_TIER2)
    n1 = len(names) - n2
    budget = n1 / 3 + n2 / 4
    assert budget <= WINDOW, (
        f"registry over window capacity: {n1} tier-1 /3 + {n2} tier-2 /4 "
        f"= {budget:.1f} > {WINDOW} — consolidate queries, promote "
        "pytest-pinned verdict queries to tier 2, or widen the window"
    )
    # Headroom floor (VERDICT r12 ask #5): RETIRED in the optimization
    # phase (r14+).  The driver contract forbids removing or renaming a
    # declared query once certified, so the mid-r14 consolidation of
    # q87/q93/q110 was reverted — that puts the budget above the old
    # "slack for 2 more tier-1 entries" floor, which is moot anyway: the
    # registry is FROZEN during optimization rounds (no new operators
    # register), so the only invariant that still matters is the hard
    # feasibility bound asserted above.


def test_tier2_names_are_registered(state):
    names, _ = state
    unknown = sorted(_GATE_TIER2 - set(names))
    assert not unknown, f"_GATE_TIER2 names not in REGISTRY: {unknown}"


def test_rotation_policy_converges(state):
    """Simulate 8 future rounds under the generator: tier-1 staleness
    stays <= 3 and tier-2 <= 4.

    Each simulated round certifies the first 50 names of the generated
    order, then the order is regenerated from the updated union — the
    exact process the repo commits each round.  If the policy itself had
    a hole (e.g. never-certified names starving a stale block, or the
    tier-2 deferral starving tier 1), this catches it before the driver
    does.
    """
    names, certified = state
    last = {n: certified[n][0] for n in names if n in certified}
    pos = {n: certified[n][1] if n in certified else i for i, n in enumerate(names)}
    current = max(last.values(), default=0)
    for rnd in range(current + 1, current + 9):
        cert_view = {n: (r, pos[n]) for n, r in last.items()}
        order = generate(names, cert_view, _GATE_TIER2)
        for slot, n in enumerate(order[:WINDOW]):
            last[n] = rnd
            pos[n] = slot
        for n, r in last.items():
            bound = 4 if n in _GATE_TIER2 else 3
            assert rnd - r <= bound, (
                f"round {rnd}: {n} staleness {rnd - r} > {bound}"
            )
    assert len(last) == len(names), "some registry entry never entered the window"
