"""Bench CLI contract pins: the driver tails ~2 kB of stdout and
parses the LAST line as JSON -- the round-4 record was lost to a
headline object that outgrew the capture window."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)


def test_headline_json_stays_under_tail_capture():
    """Worst-case-width headline (every query at 5-digit seconds)
    must stay well under the ~2,000-char driver capture, with slack
    for a few more headline queries."""
    from bench import HEADLINE, REPS

    fake = {
        "metric": "headline_queries_total_runtime",
        "value": 99999.9999,
        "unit": "sec",
        "estimator": f"min-of-{REPS}-interleaved",
        "queries": {n: 99999.9999 for n in HEADLINE},
        "sf": 0.1,
    }
    assert len(json.dumps(fake)) < 1900


def test_reps_never_inline_in_headline():
    """The per-rep arrays (the round-4 overflow) must not be emitted
    on stdout: bench.py sends them to stderr."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    assert '"reps": all_reps' not in src.replace("'", '"') or (
        "sys.stderr" in src
    )
    # the stdout print must not contain a reps key
    stdout_call = src[src.rindex("print(") :]
    assert "reps" not in stdout_call
