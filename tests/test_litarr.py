"""Bit-identity pin for similarity._lit_arr (VERDICT r18 task #7).

_lit_arr guards ~17 literal-array call sites (PQ/IVF codebooks, LSH
hyperplane banks, PCA vectors, Bloom bitmaps, semdedup grids) whose
results feed hash-matched oracle checks: it renders values as ONE parsed
SQL array literal instead of F.lit's one-Py4J-call-per-element tree, and
its correctness rests on repr(float) -> Double.parseDouble being a
bit-exact round trip plus F.array's INT->BIGINT widening rule. These
tests pin that equivalence on the adversarial leaves (max double,
denormal 5e-324, signed zero, int32/int64 boundaries, nested arrays) by
comparing collected values AND schema against the F.lit tree itself, so
a future edit to the renderer cannot silently drift from the per-element
path on some leaf type.
"""
from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from weather_database_system_spark.operators.similarity import _lit_arr

MAX_D = 1.7976931348623157e308   # largest finite double
DENORM = 5e-324                  # smallest positive denormal
I32_MAX = 2**31 - 1
I64_MAX = 2**63 - 1


def _bits(x):
    """Bit pattern of a float (distinguishes -0.0 from 0.0, exact NaN/ulp)."""
    if isinstance(x, float):
        return struct.pack(">d", x)
    return x


def _deep_bits(v):
    if isinstance(v, list):
        return [_deep_bits(x) for x in v]
    return _bits(v)


CASES = [
    # doubles: extremes of the repr/parseDouble round-trip argument
    pytest.param([MAX_D, -MAX_D, DENORM, -DENORM], id="double-extremes"),
    pytest.param([0.0, -0.0, 1.0, -1.0], id="signed-zero"),
    pytest.param([0.1, 1.0 / 3.0, math.pi, 2.2250738585072014e-308],
                 id="double-inexact"),
    # ints: INT stays INT below 2^31, widens to BIGINT beyond (F.array rule)
    pytest.param([0, 1, -1, I32_MAX, -(2**31)], id="int32-range"),
    pytest.param([I64_MAX, -(2**63), 0], id="int64-range"),
    pytest.param([1, I64_MAX], id="int-bigint-widening"),
    # nested arrays (codebook shape): ARRAY<ARRAY<DOUBLE>>
    pytest.param([[MAX_D, -0.0], [DENORM, 0.5]], id="nested-double"),
    pytest.param([[1, 2], [I64_MAX, 4]], id="nested-int-widening"),
]


@pytest.mark.parametrize("values", CASES)
def test_lit_arr_bit_identical_to_flit(spark, values):
    """_lit_arr(values) and F.lit(values) must produce the same schema and
    bit-identical collected values."""
    a = spark.range(1).select(
        _lit_arr(values).alias("v")
    )
    b = spark.range(1).select(F.lit(values).alias("v"))
    assert a.schema["v"].dataType.simpleString() == \
        b.schema["v"].dataType.simpleString()
    va = a.collect()[0]["v"]
    vb = b.collect()[0]["v"]
    assert _deep_bits(va) == _deep_bits(vb)
    # and the renderer reproduced the INPUT exactly, not merely F.lit
    assert _deep_bits(va) == _deep_bits([
        [float(x) for x in v] if isinstance(v, list) and any(
            isinstance(x, float) for x in v
        ) else v
        for v in values
    ] if all(isinstance(v, list) for v in values) else values)


def test_lit_arr_rejects_ambiguous_or_mixed():
    """Intentional strictness (ADVICE r18): empty arrays (ambiguous type)
    and mixed INT/DOUBLE leaves raise at build time — callers pre-normalize
    (F.lit would coerce int+float to array<double>; no current call site
    mixes, and a silent coercion here could mask a bug upstream)."""
    with pytest.raises(ValueError):
        _lit_arr([])
    with pytest.raises(TypeError):
        _lit_arr([1, 2.0])
    with pytest.raises(TypeError):
        _lit_arr([True, False])
    with pytest.raises(ValueError):
        _lit_arr([float("nan")])
    with pytest.raises(ValueError):
        _lit_arr([float("inf")])
