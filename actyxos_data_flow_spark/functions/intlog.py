"""Exact integer base-2 logarithm — the libm-free score kernel.

Round 9 lesson (dsir_select's first draft): ANY quantization of a libm
value in a hashed column eventually splits across engine builds — with
4096 ln() sites, several are always within an ulp of a 6dp rounding
boundary, so "rounded libm" cannot scale past a handful of watched
sites. This module removes the transcendental entirely: ``log2`` of a
positive rational is computed by the classic shift-and-square
algorithm over SCALED INTEGERS, truncating at every step. Truncation
is part of the contract — both engines evaluate the identical
generated expression text (pure CASE / * / integer division), so the
result is build-independent BY CONSTRUCTION, like the mix family's
isqrt/iroot5 ladder.

Definition: for a column ``y0`` holding ``floor(r · 2^30)`` of a
positive rational r, and its bit length ``blen``,

    ilog2_fp20(r) = e · 2^20 + f,   e = blen(y0) − 31,
    f = 20 bits from squaring the normalized mantissa m ∈ [2^30, 2^31):
        s = (m · m) div 2^30;  bit = [s ≥ 2^31];  m' = s div 2 if bit else s

Error: the initial y0 truncation contributes ≤ 1/(y0·ln2) and the 20
squaring steps compound ≤ 2^-30 each to ≤ 2^-10 relative (≈1.4e-3 in
log2 worst case; ~1e-5 on typical inputs), always UNDERSHOOTING. The
guarantee that matters here is NOT closeness to true log2 but
bit-exact reproducibility of the same integer on every engine build.

Overflow envelope (64-bit signed): y0 = (num << 30) div den needs
num < 2^33; m² < 2^62. Callers assert their num bound.
"""

from __future__ import annotations

ILOG_FRAC_BITS = 20
ILOG_ONE = 1 << ILOG_FRAC_BITS
_S30 = 1 << 30
_S31 = 1 << 31


def ilog2_cols(y0: str, blen: str, div: str = "DIV") -> list[tuple[str, str]]:
    """Ordered (column, expression) steps computing ``ilog2_fp20`` from
    a positive scaled-integer column ``y0`` (= floor(r·2^30)) and its
    bit-length column ``blen``. Each expression references only earlier
    columns. ``div`` is the integer-division token: ``DIV`` for Spark
    SQL, ``//`` for DuckDB — the only token that differs; everything
    else is shared text."""
    mcase = (
        "CASE "
        + " ".join(
            f"WHEN {blen} = {b} THEN "
            + (f"{y0} {div} {1 << (b - 31)}" if b >= 31 else f"{y0} * {1 << (31 - b)}")
            for b in range(1, 64)
        )
        + " END"
    )
    steps: list[tuple[str, str]] = [
        ("il_e", f"({blen} - 31)"),
        ("il_m0", f"({mcase})"),
        ("il_f0", "0"),
    ]
    for i in range(ILOG_FRAC_BITS):
        steps.append((f"il_s{i}", f"((il_m{i} * il_m{i}) {div} {_S30})"))
        steps.append(
            (
                f"il_f{i + 1}",
                f"(il_f{i} * 2 + (CASE WHEN il_s{i} >= {_S31} THEN 1 ELSE 0 END))",
            )
        )
        steps.append(
            (f"il_m{i + 1}", f"(CASE WHEN il_s{i} >= {_S31} THEN il_s{i} {div} 2 ELSE il_s{i} END)")
        )
    steps.append(("ilog2_fp20", f"(il_e * {ILOG_ONE} + il_f{ILOG_FRAC_BITS})"))
    return steps


def ilog_chain_sql(inner: str, div: str = "//") -> str:
    """Nest the kernel steps over an inner SELECT providing positive
    columns ``y0`` and ``blen`` — the SQL-side rendering used by DuckDB
    oracles (``div='//'``). The outermost SELECT exposes every inner
    column plus ``ilog2_fp20``."""
    q = inner
    for col, expr in ilog2_cols("y0", "blen", div=div):
        q = f"SELECT *, {expr} AS {col} FROM ({q})"
    return q


def py_ilog2_fp20(num: int, den: int) -> int:
    """Driver-side twin of :func:`ilog2_cols` — the SAME truncating
    algorithm in plain Python, for model-sized constants (e.g. a global
    normalizer) that must agree bit-for-bit with the in-plan kernel."""
    assert num > 0 and den > 0
    assert num < (1 << 33), f"num {num} exceeds the 2^33 overflow envelope"
    # ratios below 2^-30 floor to the smallest representable input
    # (ilog2 = -30·2^20) — the same clamp call sites apply in-plan via
    # greatest(y0, 1), so the twin and both engines agree on the floor
    y0 = max((num << 30) // den, 1)
    blen = y0.bit_length()
    e = blen - 31
    m = y0 // (1 << (blen - 31)) if blen >= 31 else y0 * (1 << (31 - blen))
    f = 0
    for _ in range(ILOG_FRAC_BITS):
        s = (m * m) // _S30
        if s >= _S31:
            f = f * 2 + 1
            m = s // 2
        else:
            f = f * 2
            m = s
    return e * ILOG_ONE + f
