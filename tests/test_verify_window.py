"""Driver-contract ordering: the correctness harness verifies the
first ~50 queries() entries, so `_VERIFY_FIRST` IS the round's
official verification window. These tests pin the rotation state so a
refactor can't silently reorder the catalog before the driver runs
(round-10 VERDICT next-round items 1-2; round-11 items 1+6).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entry  # noqa: E402

# r12 window: the FINAL 22 never-officially-checked queries followed
# by the 28 stalest official rows (last driver-checked round 5). These
# pins are PER-ROUND state: update them (and the CORRECTNESS range
# below) when the window rotates — failing on rotation is the point,
# it forces the new window to be declared deliberately.
R12_FIRST, R12_LAST = "spearman_corr", "quality_filter"
N_NEVER = 22  # positions 0..21 must have no official row yet
PRIOR_ROUNDS = range(1, 12)  # CORRECTNESS_r1..r11 existed at rotation


def _official_last_round() -> dict[str, int]:
    # Driver files are zero-padded (CORRECTNESS_r01.json); glob both
    # forms — the r11 test's unpadded-only lookup matched nothing and
    # its never-checked assertion passed vacuously.
    last: dict[str, int] = {}
    for i in PRIOR_ROUNDS:
        for p in (os.path.join(ROOT, f"CORRECTNESS_r{i:02d}.json"),
                  os.path.join(ROOT, f"CORRECTNESS_r{i}.json")):
            if os.path.exists(p):
                with open(p) as fh:
                    for name in json.load(fh):
                        last[name] = i
                break
    assert last, "no CORRECTNESS_r*.json found — pattern drifted again"
    return last


def test_verify_first_names_all_resolve():
    qs = entry.queries()
    missing = [n for n in entry._VERIFY_FIRST if n not in qs]
    assert not missing, f"_VERIFY_FIRST names not in queries(): {missing}"


def test_window_leads_catalog_order():
    names = list(entry.queries())
    assert names[0] == R12_FIRST
    assert names[49] == R12_LAST
    assert names[:50] == list(entry._VERIFY_FIRST[:50])


def test_window_head_is_never_officially_checked():
    # The first 22 window slots finish the never-checked backlog; none
    # may already hold an official green row (that would waste budget).
    seen = set(_official_last_round())
    dup = [n for n in entry._VERIFY_FIRST[:N_NEVER] if n in seen]
    assert not dup, f"window wastes budget on already-official rows: {dup}"


def test_window_tail_refreshes_stalest_rows():
    # Slots 22..49 are deliberate re-certification: each must be an
    # already-official row from the stalest round present (r5).
    last = _official_last_round()
    refresh = entry._VERIFY_FIRST[N_NEVER:50]
    not_official = [n for n in refresh if n not in last]
    assert not not_official, f"refresh slots never checked: {not_official}"
    oldest = min(last.values())
    wrong = [n for n in refresh if last[n] != oldest]
    assert not wrong, f"refresh slots not from stalest round r{oldest}: {wrong}"


def test_tail_ordered_stalest_first():
    # Beyond the window the tuple stays sorted by last-official-check
    # round so each future rotation's 50-row window doubles as a
    # rolling re-certification (r11 VERDICT item 6).
    last = _official_last_round()
    rounds = [last[n] for n in entry._VERIFY_FIRST[50:] if n in last]
    assert rounds == sorted(rounds), "tail not stalest-first"


def test_every_window_query_has_oracle():
    # The driver's value-hash compare needs an oracle_sql entry; a
    # rows-only check is a weaker gate the window shouldn't ship.
    oracles = entry.oracle_sql()
    weak = [n for n in entry._VERIFY_FIRST[:50] if n not in oracles]
    assert not weak, f"window queries without oracle SQL: {weak}"
