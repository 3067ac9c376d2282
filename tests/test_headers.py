"""Header rewriting tests mirroring the reference's write_header matrix
(``/root/reference/src/bin/commands/demux.rs:2084-2196``)."""

import pytest

from fqtk_tpu.core.headers import HeaderError, rewrite_header


def test_standard_no_umi():
    out = rewrite_header(
        b"inst:123:ABCDE:1:204:1022:2108 1:N:0:0", 1, [b"ACGT", b"GGTT"], []
    )
    assert out == b"@inst:123:ABCDE:1:204:1022:2108 1:N:0:ACGT+GGTT"


def test_standard_with_umi():
    out = rewrite_header(
        b"inst:123:ABCDE:1:204:1022:2108 1:Y:0:0", 2, [b"ACGT", b"GGTT"], [b"AACCGGTT"]
    )
    assert out == b"@inst:123:ABCDE:1:204:1022:2108:AACCGGTT 2:Y:0:ACGT+GGTT"


def test_append_barcode_and_umi():
    out = rewrite_header(
        b"inst:123:ABCDE:1:204:1022:2108:AAAA 1:Y:0:TTTT",
        2,
        [b"ACGT", b"GGTT"],
        [b"AACCGGTT"],
    )
    assert out == b"@inst:123:ABCDE:1:204:1022:2108:AAAA+AACCGGTT 2:Y:0:TTTT+ACGT+GGTT"


def test_short_name_no_comment():
    out = rewrite_header(b"q1", 1, [b"ACGT", b"GGTT"], [b"AACCGGTT"])
    assert out == b"@q1:AACCGGTT 1:N:0:ACGT+GGTT"


def test_name_too_many_parts():
    with pytest.raises(HeaderError, match="8 segments"):
        rewrite_header(b"q1:1:2:3:4:5:6:7:8:9:10", 1, [b"ACGT"], [b"AACCGGTT"])


def test_comment_too_few_parts():
    out = rewrite_header(b"q1 0:0", 1, [b"ACGT", b"GGTT"], [b"AACCGGTT"])
    assert out == b"@q1:AACCGGTT 0:0:ACGT+GGTT"


def test_no_umi_no_comment():
    out = rewrite_header(b"ex_0", 1, [b"AAAAAAAAGATTACAGA"], [])
    assert out == b"@ex_0 1:N:0:AAAAAAAAGATTACAGA"


def test_read_num_substituted():
    out = rewrite_header(b"ex_0", 3, [b"GGG"], [])
    assert out == b"@ex_0 3:N:0:GGG"


def test_multiple_umis_joined_with_plus():
    out = rewrite_header(b"ex_0", 1, [b"AAAA"], [b"CCCC", b"A"])
    assert out == b"@ex_0:CCCC+A 1:N:0:AAAA"


def test_comment_index_not_digit_appends_plus():
    out = rewrite_header(b"q1 1:N:0:AACC", 2, [b"GATT"], [])
    assert out == b"@q1 2:N:0:AACC+GATT"


def test_comment_trailing_colon_no_plus():
    out = rewrite_header(b"q1 1:N:0:", 2, [b"GATT"], [])
    assert out == b"@q1 2:N:0:GATT"


def test_comment_too_many_parts():
    with pytest.raises(HeaderError, match="4 segments"):
        rewrite_header(b"q1 1:N:0:0:0", 1, [b"ACGT"], [])


def test_empty_comment_fails_fast():
    # A header ending in a space has an empty comment; the reference panics
    # (`chars.last().unwrap()` on None, demux.rs:231) — matched as an error.
    with pytest.raises(HeaderError, match="Header comment is empty"):
        rewrite_header(b"q1 ", 1, [b"ACGT"], [])


def test_degenerate_four_part_comment_empty_fields():
    # comment ":::" has 3 colons and all-empty fields; the reference's
    # remainder is "::" (non-empty), emitted without a trailing '+'
    # (demux.rs:238-255)
    out = rewrite_header(b"q1 :::", 2, [b"GATT"], [])
    assert out == b"@q1 2:::GATT"


def test_degenerate_four_part_comment_trailing_digit_strip():
    # ":::5" strips the Illumina '0'-style trailing digit placeholder,
    # remainder "::" again ends in ':' so no '+' separator
    out = rewrite_header(b"q1 :::5", 2, [b"GATT"], [])
    assert out == b"@q1 2:::GATT"
