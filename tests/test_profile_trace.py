"""Unit tests for the xprof-trace attribution math (scripts/profile_trace).

The r3 instrument summed raw event durations, so the scan ``while``
wrapper double-counted its entire body (~2x overstated glue — VERDICT r3
weak #4). These tests pin the self-time computation that replaced it.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from profile_trace import self_times  # noqa: E402


def as_dict(pairs):
    d = {}
    for nm, dur in pairs:
        d[nm] = d.get(nm, 0.0) + dur
    return d


def test_nested_parent_excludes_children():
    # while.4 [0, 100) wraps fusion.1 [10, 40) and fusion.2 [50, 90)
    evs = [("while.4", 0.0, 100.0, 1, 1),
           ("fusion.1", 10.0, 30.0, 1, 1),
           ("fusion.2", 50.0, 40.0, 1, 1)]
    d = as_dict(self_times(evs))
    assert d["while.4"] == 30.0          # 100 - 30 - 40
    assert d["fusion.1"] == 30.0
    assert d["fusion.2"] == 40.0
    assert sum(d.values()) == 100.0      # additive: == top-level span


def test_deep_nesting_only_direct_children_subtracted_once():
    # a [0,100) > b [0,100) > c [20,30)  (b same extent as parent a)
    evs = [("a", 0.0, 100.0, 1, 1),
           ("b", 0.0, 100.0, 1, 1),
           ("c", 20.0, 10.0, 1, 1)]
    d = as_dict(self_times(evs))
    assert d["a"] == 0.0
    assert d["b"] == 90.0
    assert d["c"] == 10.0
    assert sum(d.values()) == 100.0


def test_separate_tracks_do_not_interact():
    evs = [("x", 0.0, 50.0, 1, 1), ("y", 0.0, 50.0, 1, 2)]
    d = as_dict(self_times(evs))
    assert d == {"x": 50.0, "y": 50.0}


def test_sequential_events_untouched():
    evs = [("x", 0.0, 10.0, 1, 1), ("y", 10.0, 10.0, 1, 1),
           ("x", 20.0, 5.0, 1, 1)]
    d = as_dict(self_times(evs))
    assert d == {"x": 15.0, "y": 10.0}


def test_repeated_scan_iterations_accumulate():
    # two while iterations, each wrapping one kernel
    evs = [("while.4", 0.0, 50.0, 1, 1), ("k", 5.0, 40.0, 1, 1),
           ("while.4", 60.0, 50.0, 1, 1), ("k", 65.0, 40.0, 1, 1)]
    d = as_dict(self_times(evs))
    assert d["while.4"] == 20.0
    assert d["k"] == 80.0
