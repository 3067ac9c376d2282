"""ryu-style float formatting tests for the metrics TSV."""

import math

from fqtk_tpu.utils.floatfmt import format_f64


def test_basic():
    assert format_f64(0.0) == "0.0"
    assert format_f64(1.0) == "1.0"
    assert format_f64(0.5) == "0.5"
    assert format_f64(0.25) == "0.25"
    assert format_f64(2.0) == "2.0"
    assert format_f64(1 / 3) == "0.3333333333333333"
    assert format_f64(2 / 1.5) == "1.3333333333333333"


def test_nonfinite():
    assert format_f64(math.nan) == "NaN"
    assert format_f64(math.inf) == "inf"
    assert format_f64(-math.inf) == "-inf"


def test_small_values_positional():
    assert format_f64(1e-5) == "0.00001"
    assert format_f64(2.5e-5) == "0.000025"
    assert format_f64(1.25e-4) == "0.000125"


def test_tiny_values_scientific():
    assert format_f64(1e-7) == "1e-7"
    assert format_f64(2.5e-7) == "2.5e-7"


def test_negative():
    assert format_f64(-0.5) == "-0.5"
    assert format_f64(-0.0) == "-0.0"
