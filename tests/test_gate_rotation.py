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

from swiftlake_spark.queries import _GATE_PRIORITY, REGISTRY, _load_all  # noqa: E402


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
    want_now = generate(names, certified)[:WINDOW]
    if got == want_now:
        return
    prev = certified_rounds(exclude_newest=True)
    want_prev = generate(names, prev)[:WINDOW]
    assert got == want_prev, (
        "committed _GATE_PRIORITY window diverged from "
        "scripts/gen_gate_priority.py by more than one round of lag — "
        "regenerate and commit"
    )


def test_boundary_block_heads_window(state):
    """Every query at the staleness boundary is inside the driver window.

    Like the generator-match test, the boundary may be computed against
    the full union or the union excluding the newest round (rotation
    pending at handoff) — one generation of lag is legal, more is not.
    """
    names, certified = state
    window = set(list(_GATE_PRIORITY)[:WINDOW])

    def missing_for(cert):
        known = [n for n in names if n in cert]
        boundary_round = min(cert[n][0] for n in known)
        boundary = {n for n in known if cert[n][0] == boundary_round}
        return boundary_round, boundary - window

    boundary_round, missing = missing_for(certified)
    if missing:
        _, missing_prev = missing_for(certified_rounds(exclude_newest=True))
        assert not missing_prev, (
            f"stale-boundary queries (last green r{boundary_round}) outside "
            f"the 50-slot window: {sorted(missing)}"
        )


def test_window_names_are_registered(state):
    names, certified = state
    unknown = [n for n in _GATE_PRIORITY if n not in set(names)]
    assert not unknown, f"_GATE_PRIORITY names not in REGISTRY: {unknown}"


def test_registry_size_keeps_invariant_feasible(state):
    """3-round max staleness needs N <= 3 * window."""
    names, _ = state
    assert len(names) <= 3 * WINDOW, (
        f"registry has {len(names)} queries; a 50-slot window can no longer "
        "hold 3-round staleness — widen the window policy first"
    )


def test_rotation_policy_converges(state):
    """Simulate 8 future rounds under the generator: staleness stays <= 3.

    Each simulated round certifies the first 50 names of the generated
    order, then the order is regenerated from the updated union — the
    exact process the repo commits each round.  If the policy itself had
    a hole (e.g. never-certified names starving a stale block), this
    catches it before the driver does.
    """
    names, certified = state
    last = {n: certified[n][0] for n in names if n in certified}
    pos = {n: certified[n][1] if n in certified else i for i, n in enumerate(names)}
    current = max(last.values(), default=0)
    for rnd in range(current + 1, current + 9):
        cert_view = {n: (r, pos[n]) for n, r in last.items()}
        order = generate(names, cert_view)
        for slot, n in enumerate(order[:WINDOW]):
            last[n] = rnd
            pos[n] = slot
        worst = rnd - min(last.values(), default=rnd)
        assert worst <= 3, f"round {rnd}: staleness {worst} > 3 under the policy"
    assert len(last) == len(names), "some registry entry never entered the window"
