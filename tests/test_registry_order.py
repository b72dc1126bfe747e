"""Driver-priority order is DERIVED from recorded harness results.

Round-5 verdict: the hand-curated `_DRIVER_PRIORITY` list silently
dropped `pq_topk_adc` (registered, never surfaced). The fix replaces
the hand list with `_derive_driver_priority`, which reads
CORRECTNESS_r*.json and guarantees:

  1. never-harness-checked queries sort first (registration order);
  2. checked queries sort by the round of their most recent check,
     stalest first — so the 50-row window rotates through the whole
     registry over rounds and no query can be permanently shadowed.
"""

from __future__ import annotations

from transcript_analysis_spark.plans.registry import (
    _derive_driver_priority,
    _recorded_check_rounds,
)


def test_never_checked_sort_first_then_stalest():
    registered = ["a", "b", "c", "d", "e"]
    latest = {"a": (3, False), "c": (1, False), "e": (2, False)}
    order = _derive_driver_priority(registered, latest)   # b, d unchecked
    assert order == ["b", "d", "c", "e", "a"]


def test_red_rows_outrank_everything():
    """A recorded FAILURE must re-enter the window ahead even of
    never-checked queries — the old hand list's
    session_windows_per_user property, now structural."""
    registered = ["a", "b", "c", "d"]
    latest = {"a": (5, False), "c": (4, True)}     # c red in its last check
    order = _derive_driver_priority(registered, latest)
    assert order == ["c", "b", "d", "a"]


def test_registration_order_breaks_ties():
    registered = ["z", "y", "x"]
    order = _derive_driver_priority(
        registered, {"z": (1, False), "y": (1, False), "x": (1, False)})
    assert order == ["z", "y", "x"]


def test_empty_history_degrades_to_registration_order():
    registered = ["q1", "q2", "q3"]
    assert _derive_driver_priority(registered, {}) == registered


def test_real_repo_state_surfaces_unchecked_head():
    """Against the actual CORRECTNESS_r*.json files: every query with
    no recorded row must precede every query with one."""
    from transcript_analysis_spark.plans import all_queries

    latest = _recorded_check_rounds()
    names = list(all_queries())
    assert len(names) >= 162
    seen_checked = False
    for n in names:
        if n in latest:
            seen_checked = True
        else:
            assert not seen_checked, (
                f"never-checked query {n!r} sorted after a checked one")
    # regression pin for the round-5 failure mode: pq_topk_adc had no
    # driver row in r1-r5, so with that history it must sit in the
    # window head (first 50), not at the tail
    if "pq_topk_adc" not in latest:
        assert names.index("pq_topk_adc") < 50


def test_recorded_rounds_parse():
    latest = _recorded_check_rounds()
    # r1-r5 files ship with the repo: the union covers >100 queries
    # and every value is a plausible (round, red, rows_only) triple
    assert len(latest) >= 100
    for rnd, red, rows_only in latest.values():
        assert isinstance(rnd, int) and 1 <= rnd <= 99
        assert isinstance(red, bool)
        assert isinstance(rows_only, bool)
    # rows-only results (hash_match null) are NOT red
    assert latest["bpe_merge_learn"][1] is False
    # memoized: second call returns the identical object
    assert _recorded_check_rounds() is latest


def test_oracle_upgrade_outranks_stale_green():
    """A query whose latest row was a rows-only `err: no_oracle` check
    but which NOW registers an oracle has never earned a hash row —
    it must sort in tier 1 (with never-checked), ahead of stale-green,
    so the new oracle surfaces to the driver window immediately
    (round-6 verdict: bpe_merge_learn/bpe_encode_stats)."""
    registered = ["stale_green", "upgraded", "fresh_green", "unchecked"]
    latest = {
        "stale_green": (1, False, False),
        "upgraded": (5, False, True),      # rows-only at its last check
        "fresh_green": (5, False, False),
    }
    order = _derive_driver_priority(
        registered, latest, oracled={"upgraded", "stale_green", "fresh_green"})
    # unchecked first within tier 1 (round 0), then the upgraded query,
    # then greens stalest-first
    assert order == ["unchecked", "upgraded", "stale_green", "fresh_green"]


def test_rows_only_without_oracle_stays_green_tier():
    """Irreducibly rows-only queries (no oracle registered) must NOT
    churn in tier 1 forever — they rotate like any green row."""
    registered = ["a", "b"]
    latest = {"a": (2, False, True), "b": (1, False, False)}
    order = _derive_driver_priority(registered, latest, oracled={"b"})
    assert order == ["b", "a"]


def test_bpe_pair_surfaces_in_window_head():
    """Against the real repo state: the BPE pair gained oracles after
    their last recorded (r5, rows-only) check, so they must sit inside
    the driver's 50-query window head until a hash row lands."""
    from transcript_analysis_spark.plans import all_queries
    from transcript_analysis_spark.plans.registry import get_query

    latest = _recorded_check_rounds()
    names = list(all_queries())
    for q in ("bpe_merge_learn", "bpe_encode_stats"):
        rec = latest.get(q)
        if rec is None or not rec[2] or get_query(q).oracle is None:
            continue   # a hash row has landed (or oracle removed) — done
        assert names.index(q) < 50, f"{q} not in driver window head"
