"""Read-structure grammar and extraction tests (spec per the reference's use
of the ``read-structure`` crate, ``/root/reference/src/bin/commands/demux.rs:298-337``
and ``README.md:56-68``)."""

import pytest

from fqtk_tpu.core.read_structure import (
    ReadStructure,
    ReadStructureError,
    SegmentType,
)


def test_parse_simple():
    rs = ReadStructure.from_str("8B92T")
    assert len(rs) == 2
    assert rs.segments[0].kind == SegmentType.SampleBarcode
    assert rs.segments[0].length == 8
    assert rs.segments[0].offset == 0
    assert rs.segments[1].kind == SegmentType.Template
    assert rs.segments[1].length == 92
    assert rs.segments[1].offset == 8
    assert str(rs) == "8B92T"


def test_parse_variable_tail():
    rs = ReadStructure.from_str("17B+T")
    assert rs.segments[1].length is None
    assert rs.min_length() == 18
    assert str(rs) == "17B+T"


def test_parse_all_operators():
    rs = ReadStructure.from_str("4B4M8S7C+T")
    kinds = [s.kind for s in rs]
    assert kinds == [
        SegmentType.SampleBarcode,
        SegmentType.MolecularBarcode,
        SegmentType.Skip,
        SegmentType.CellularBarcode,
        SegmentType.Template,
    ]


def test_parse_lowercase_normalized():
    assert str(ReadStructure.from_str("8b100t")) == "8B100T"


@pytest.mark.parametrize(
    "bad", ["", "8", "B8", "+T8B", "8X", "0T", "8B+T4M", "+", "8B +T"]
)
def test_parse_rejects(bad):
    with pytest.raises(ReadStructureError):
        ReadStructure.from_str(bad)


def test_min_length_fixed():
    assert ReadStructure.from_str("100S3B").min_length() == 103
    assert ReadStructure.from_str("+T").min_length() == 1


def test_extract_fixed():
    rs = ReadStructure.from_str("4B4M8S")
    bases = b"AAAACCCCGGGGTTTT"
    quals = b";" * 16
    seqs = [seg.extract_bases_and_quals(bases, quals)[0] for seg in rs]
    assert seqs == [b"AAAA", b"CCCC", b"GGGGTTTT"]


def test_extract_variable_takes_remainder():
    rs = ReadStructure.from_str("4B+T")
    seq, qual = rs.segments[1].extract_bases_and_quals(b"AAAACCCGG", b"IIIIJJJKK")
    assert seq == b"CCCGG"
    assert qual == b"JJJKK"


def test_extract_ignores_extra_bases_for_fixed():
    rs = ReadStructure.from_str("4B")
    seq, _ = rs.segments[0].extract_bases_and_quals(b"AAAACC", b";;;;;;")
    assert seq == b"AAAA"


def test_extract_too_short_raises():
    rs = ReadStructure.from_str("8B")
    with pytest.raises(ReadStructureError):
        rs.segments[0].extract_bases_and_quals(b"AAAA", b";;;;")


def test_extract_variable_empty_raises():
    rs = ReadStructure.from_str("4B+T")
    with pytest.raises(ReadStructureError):
        rs.segments[1].extract_bases_and_quals(b"AAAA", b";;;;")


def test_segments_by_type():
    rs = ReadStructure.from_str("17B20T20S20T20S20T")
    assert len(rs.segments_by_type(SegmentType.Template)) == 3
    assert len(rs.segments_by_type(SegmentType.SampleBarcode)) == 1
