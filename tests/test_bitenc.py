"""BitEnc + single-read BarcodeMatcher tests (library parity with
``/root/reference/src/lib/bitenc.rs`` and ``barcode_matching.rs``)."""

import pytest

from fqtk_tpu.core.barcode_matcher import BarcodeMatch, BarcodeMatcher
from fqtk_tpu.core.bitenc import BitEnc, encode_bitenc
from fqtk_tpu.core.samples import Sample


def _samples(barcodes):
    return [Sample(f"sample_{i}", b, i) for i, b in enumerate(barcodes)]


# ---------------------------------------------------------------------------
# BitEnc (bitenc.rs test block)
# ---------------------------------------------------------------------------


def test_bitenc_push_set_iter():
    enc = BitEnc(2)
    enc.push(0)
    enc.push(2)
    enc.push(1)
    assert list(enc) == [0, 2, 1]
    enc.set(1, 3)
    assert list(enc) == [0, 3, 1]


def test_bitenc_push_values():
    enc = BitEnc(2)
    enc.push_values(32, 0)
    assert list(enc) == [0] * 32
    assert enc.nr_blocks() == 2
    assert enc.nr_symbols() == 32


def test_bitenc_widths():
    for width in range(1, 9):
        enc = BitEnc(width)
        maxv = (1 << width) - 1
        for v in (0, 1, maxv):
            enc.push(v)
        assert list(enc) == [0, 1, maxv]


def test_bitenc_invalid_width():
    with pytest.raises(ValueError):
        BitEnc(9)


def test_bitenc_many_pushes_all_widths():
    """Bulk pushes across every width never corrupt earlier symbols
    (reference regression test ``bitenc.rs:549`` / rust-bio issue 29)."""
    for width in range(2, 9):
        enc = BitEnc(width)
        for _ in range(1000):
            enc.push(1)
        assert enc.nr_symbols() == 1000
        assert all(v == 1 for v in enc)


def test_bitenc_clear_empty():
    enc = BitEnc(2)
    assert enc.is_empty()
    enc.push(2)
    assert not enc.is_empty()
    enc.clear()
    assert enc.is_empty()


def test_bitenc_get_out_of_range():
    enc = BitEnc(4)
    enc.push(7)
    assert enc.get(1) is None


def test_hamming_asymmetric_iupac():
    # observed ⊆ expected → no mismatch (bitenc.rs:420-427)
    assert encode_bitenc(b"R").hamming(encode_bitenc(b"N"), 255) == 0
    assert encode_bitenc(b"N").hamming(encode_bitenc(b"R"), 255) == 1
    assert encode_bitenc(b"GATTACA").hamming(encode_bitenc(b"GANNACA"), 255) == 0
    assert encode_bitenc(b"GATTACA").hamming(encode_bitenc(b"CTAATGT"), 255) == 7


def test_hamming_early_exit_clamp():
    a = encode_bitenc(b"AAAAAAAA")
    b = encode_bitenc(b"CCCCCCCC")
    assert a.hamming(b, 3) == 3


def test_hamming_length_mismatch_raises():
    with pytest.raises(ValueError, match="same length"):
        encode_bitenc(b"AA").hamming(encode_bitenc(b"AAA"), 255)


# ---------------------------------------------------------------------------
# BarcodeMatcher single-read API (barcode_matching.rs test block)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_cache", [True, False])
def test_matcher_assign_exact(use_cache):
    m = BarcodeMatcher(_samples(["ACGT", "AAAG", "CACA"]), 2, 2, use_cache)
    assert m.assign(b"ACGT") == BarcodeMatch(0, 0, 3)


@pytest.mark.parametrize("use_cache", [True, False])
def test_matcher_imprecise(use_cache):
    m = BarcodeMatcher(_samples(["AAAT", "AGAG", "CACA"]), 2, 2, use_cache)
    assert m.assign(b"GAAT") == BarcodeMatch(0, 1, 3)


@pytest.mark.parametrize("use_cache", [True, False])
def test_matcher_no_call_prefilter(use_cache):
    m = BarcodeMatcher(
        _samples(["AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "GGGGGGTT"]), 0, 100, use_cache
    )
    assert m.assign(b"GGGGGGTN") is None


@pytest.mark.parametrize("use_cache", [True, False])
def test_matcher_delta_gate(use_cache):
    m = BarcodeMatcher(
        _samples(["AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "GGGGGGTT"]), 100, 3, use_cache
    )
    assert m.assign(b"GGGGGGTT") is None


def test_matcher_short_read_none():
    m = BarcodeMatcher(_samples(["ACGT"]), 2, 2)
    assert m.assign(b"ACG") is None


def test_matcher_long_read_raises():
    m = BarcodeMatcher(_samples(["ACGT"]), 2, 2)
    with pytest.raises(ValueError, match="differs from expected barcode"):
        m.assign(b"ACGTA")


def test_matcher_cache_hits():
    m = BarcodeMatcher(_samples(["ACGT", "TTTT"]), 2, 2, use_cache=True)
    r1 = m.assign(b"ACGT")
    assert b"ACGT" in m._cache
    assert m.assign(b"ACGT") == r1
    # misses (None) are not cached (barcode_matching.rs:178-180)
    m2 = BarcodeMatcher(_samples(["ACGT", "ACGA"]), 0, 2, use_cache=True)
    assert m2.assign(b"AGGA") is None
    assert b"AGGA" not in m2._cache


def test_matcher_lowercases_uppercased():
    m = BarcodeMatcher(_samples(["ACGT"]), 0, 0)
    assert m.samples[0].barcode == "ACGT"


def test_matcher_empty_samples_raises():
    with pytest.raises(ValueError, match="at least one sample"):
        BarcodeMatcher([], 2, 2)


def test_bitenc_set_rejects_negative_index():
    """set(-1) would write into the last block's unused tail bits and
    corrupt hamming(); the Rust reference takes usize."""
    enc = BitEnc(4)
    enc.push_values(4, 1)
    with pytest.raises(IndexError):
        enc.set(-1, 15)
    other = BitEnc(4)
    other.push_values(4, 1)
    assert enc.hamming(other, 10) == 0
