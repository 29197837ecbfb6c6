"""Driver-contract ordering: the correctness harness verifies the
first ~50 queries() entries, so `_VERIFY_FIRST` IS the round's
official verification window. These tests pin the rotation state so a
refactor can't silently reorder the catalog before the driver runs
(round-10 VERDICT next-round items 1-2).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entry  # noqa: E402

# r11 window: the 50 stalest never-officially-checked queries
# (alphabetical tail of the catalog minus the 243 ever-green official
# rows), queued by the r10 verdict. These pins are PER-ROUND state:
# update them (and the CORRECTNESS range below) when the window
# rotates — failing on rotation is the point, it forces the new
# window to be declared deliberately.
R11_FIRST, R11_LAST = "histogram_refine_median", "source_overlap"


def test_verify_first_names_all_resolve():
    qs = entry.queries()
    missing = [n for n in entry._VERIFY_FIRST if n not in qs]
    assert not missing, f"_VERIFY_FIRST names not in queries(): {missing}"


def test_window_leads_catalog_order():
    names = list(entry.queries())
    assert names[0] == R11_FIRST
    assert names[49] == R11_LAST
    assert names[:50] == list(entry._VERIFY_FIRST[:50])


def test_window_is_never_officially_checked():
    # No name in the r11 window may already hold an official green row
    # (that would waste the round's 50-query budget re-proving it).
    seen: set[str] = set()
    for i in range(1, 11):
        p = os.path.join(ROOT, f"CORRECTNESS_r{i}.json")
        if os.path.exists(p):
            with open(p) as fh:
                seen.update(json.load(fh).keys())
    dup = [n for n in entry._VERIFY_FIRST[:50] if n in seen]
    assert not dup, f"window wastes budget on already-official rows: {dup}"


def test_every_window_query_has_oracle():
    # The driver's value-hash compare needs an oracle_sql entry; a
    # rows-only check is a weaker gate the window shouldn't ship.
    oracles = entry.oracle_sql()
    weak = [n for n in entry._VERIFY_FIRST[:50] if n not in oracles]
    assert not weak, f"window queries without oracle SQL: {weak}"
