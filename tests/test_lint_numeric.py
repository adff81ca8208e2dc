"""The numeric-hazard lint as a CI gate: every round() site in every
registered oracle must either be integer-fixed-point-free (converted)
or match a justified allowlist rule in tools/lint_numeric.py. A new
query that rounds a double quotient / libm value into a hashed column
without a recorded justification fails here — the round-7 driver
incident (round(double, k) splitting across engine builds while green
locally at every scale factor) is the reason this exists."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_no_unjustified_round_sites():
    import lint_numeric

    findings, violations = lint_numeric.run()
    assert findings, "lint found no round() sites at all — scanner broken?"
    assert not violations, violations
