"""Property tests (hypothesis) for the column-mapping path algebra and
partition-value coercion — the pure functions every rename/pruning path
leans on. Failures here are silent wrong answers downstream, so the
invariants get generative coverage beyond the scenario tests."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import (
    _all_nullable,
    _monotone_gen_source,
    _part_cmp_pair,
    _part_range_excludes,
    _part_range_proves,
    _phys_path,
    _to_physical_type,
)

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)


@st.composite
def _colmaps(draw):
    """A consistent colmap: top-level entries (no dots) plus nested
    entries whose key prefix is a logical top name."""
    cm = {}
    for _ in range(draw(st.integers(0, 3))):
        lname, pname = draw(_ident), draw(_ident)
        if lname != pname:
            cm[lname] = pname
    for _ in range(draw(st.integers(0, 3))):
        top = draw(_ident)
        leaf_l, leaf_p = draw(_ident), draw(_ident)
        if leaf_l != leaf_p:
            ptop = cm.get(top, top)
            cm[f"{top}.{leaf_l}"] = f"{ptop}.{leaf_p}"
    return cm


@given(_colmaps(), _ident)
@settings(max_examples=200, deadline=None)
def test_phys_path_identity_when_unmapped(cm, name):
    if name not in cm and not any(k.startswith(name + ".") for k in cm):
        assert _phys_path({k: v for k, v in cm.items() if not k.startswith(name)}, name) == name


@given(_colmaps(), _ident, _ident)
@settings(max_examples=200, deadline=None)
def test_phys_path_resolves_segments_independently(cm, top, leaf):
    got = _phys_path(cm, f"{top}.{leaf}")
    segs = got.split(".")
    assert len(segs) == 2
    # top segment = top's physical; leaf = nested entry's leaf or identity
    ptop = (cm.get(top) or top).rsplit(".", 1)[-1]
    assert segs[0] == ptop
    nested = cm.get(f"{top}.{leaf}")
    assert segs[1] == (nested.rsplit(".", 1)[-1] if nested else leaf)


@given(_colmaps())
@settings(max_examples=100, deadline=None)
def test_to_physical_type_preserves_shape_and_types(cm):
    dtype = T.StructType(
        [
            T.StructField("a", T.StructType(
                [T.StructField("x", T.LongType()), T.StructField("y", T.StringType())]
            )),
            T.StructField("b", T.ArrayType(T.IntegerType())),
        ]
    )
    out = _to_physical_type(dtype, "root", cm)
    # field COUNT, ORDER (positional identity), and leaf TYPES never change
    assert len(out.fields) == 2
    assert isinstance(out.fields[0].dataType, T.StructType)
    inner = out.fields[0].dataType
    assert [f.dataType for f in inner.fields] == [T.LongType(), T.StringType()]
    assert out.fields[1].dataType == T.ArrayType(T.IntegerType())
    assert _all_nullable(out)  # nullable-relaxed form always constructible


@given(st.integers(-10**6, 10**6), st.integers(-10**6, 10**6),
       st.sampled_from([">=", ">", "<=", "<"]))
@settings(max_examples=300, deadline=None)
def test_part_range_int_trichotomy(pv, v, op):
    """excludes and proves are complementary for a single typed value:
    exactly one holds (a partition dir has ONE value, so either every row
    passes or none does)."""
    ex = _part_range_excludes(str(pv), op, v)
    pr = _part_range_proves(str(pv), op, v)
    assert ex != pr


@given(st.dates(datetime.date(1990, 1, 1), datetime.date(2050, 12, 31)),
       st.dates(datetime.date(1990, 1, 1), datetime.date(2050, 12, 31)),
       st.sampled_from([">=", ">", "<=", "<"]))
@settings(max_examples=300, deadline=None)
def test_part_range_date_agrees_with_real_comparison(pv, v, op):
    import operator

    real = {">=": operator.ge, ">": operator.gt,
            "<=": operator.le, "<": operator.lt}[op](pv, v)
    assert _part_range_proves(pv.isoformat(), op, v) == real
    assert _part_range_excludes(pv.isoformat(), op, v) == (not real)


def test_datetime_and_bool_values_always_fail_open():
    assert _part_cmp_pair("x", True) is None
    assert _part_cmp_pair("2024-01-01 00:00:00", datetime.datetime(2024, 1, 2)) is None
    assert _part_cmp_pair("abc", 5) is None  # unparsable int


@given(st.sampled_from(["year", "to_date", "date"]), _ident)
@settings(max_examples=50, deadline=None)
def test_monotone_shapes_detect_and_nonmonotone_refuse(fn, col):
    assert _monotone_gen_source(f"{fn}({col})") == col
    assert _monotone_gen_source(f"month({col})") is None
    assert _monotone_gen_source(f"{fn}({col}) + 1") is None
