"""Sample metadata tests mirroring ``/root/reference/src/lib/samples.rs:150-398``."""

import pytest

from fqtk_tpu.core.samples import Sample, SampleError, SampleGroup


def _write(tmp_path, lines):
    p = tmp_path / "sample_metadata.tsv"
    p.write_text("\n".join(lines) + "\n")
    return p


def test_reading_from_tsv_file(tmp_path):
    p = _write(
        tmp_path,
        [Sample.deserialize_header_line(), "sample1\tGATTACA", "sample2\tCATGCTA"],
    )
    g = SampleGroup.from_file(p)
    assert g.samples[0].sample_id == "sample1"
    assert g.samples[1].sample_id == "sample2"
    assert g.samples[0].barcode == "GATTACA"
    assert g.samples[1].barcode == "CATGCTA"
    assert [s.ordinal for s in g.samples] == [0, 1]


def test_reading_from_file_with_empty_lines_at_end(tmp_path):
    p = _write(
        tmp_path,
        [
            Sample.deserialize_header_line(),
            "sample1\tGATTACA",
            "sample2\tCATGCTA",
            "",
            "",
        ],
    )
    g = SampleGroup.from_file(p)
    assert len(g.samples) == 2


def test_new_sample_non_agct_bases_in_barcode_allowed():
    Sample.new(0, "s_1_example_name", "GATTANN")


def test_tsv_file_delim_error(tmp_path):
    p = _write(tmp_path, ["sample_id,barcode", "sample1,GATTACA"])
    with pytest.raises(SampleError, match="header"):
        SampleGroup.from_file(p)


def test_reading_from_file_with_no_header(tmp_path):
    p = _write(tmp_path, ["sample1\tGATTACA", "sample2\tCATGCTA"])
    with pytest.raises(SampleError, match="header"):
        SampleGroup.from_file(p)


def test_reading_header_only_file(tmp_path):
    p = _write(tmp_path, [Sample.deserialize_header_line()])
    with pytest.raises(SampleError, match="Must provide one or more sample"):
        SampleGroup.from_file(p)


def test_reading_empty_file(tmp_path):
    p = _write(tmp_path, [""])
    with pytest.raises(SampleError, match="Must provide one or more sample"):
        SampleGroup.from_file(p)


def test_reading_non_existent_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        SampleGroup.from_file(tmp_path / "nope.tsv")


def test_new_sample_success():
    s = Sample.new(0, "s_1_example_name", "GATTACA")
    assert s == Sample(sample_id="s_1_example_name", barcode="GATTACA", ordinal=0)


def test_new_sample_fail_empty_sample_name():
    with pytest.raises(SampleError, match="Sample name cannot be empty"):
        Sample.new(0, "", "GATTACA")


def test_new_sample_fail_empty_barcode():
    with pytest.raises(SampleError, match="Sample barcode cannot be empty"):
        Sample.new(0, "s_1_example_name", "")


def test_new_sample_fail_lowercase_barcode():
    with pytest.raises(SampleError, match="All sample barcode bases"):
        Sample.new(0, "s", "gattaca")


def test_from_samples_single_sample():
    s1 = Sample.new(0, "sample_1", "GATTACA")
    g = SampleGroup.from_samples([s1])
    assert g.samples == [s1]


def test_from_samples_ordinals_reassigned():
    s1 = Sample.new(0, "sample_1", "GATTACA")
    s2 = Sample.new(2, "sample_2", "CATGGAT")
    g = SampleGroup.from_samples([s1, s2])
    assert g.samples[1].ordinal == 1


def test_from_samples_fail_no_samples():
    with pytest.raises(SampleError, match="Must provide one or more sample"):
        SampleGroup.from_samples([])


def test_from_samples_fail_duplicate_names():
    with pytest.raises(SampleError, match="Each sample name must be unique"):
        SampleGroup.from_samples(
            [Sample.new(0, "sample_1", "GATTACA"), Sample.new(0, "sample_1", "CATGGAT")]
        )


def test_from_samples_fail_duplicate_barcodes():
    with pytest.raises(SampleError, match="Each sample barcode must be unique"):
        SampleGroup.from_samples(
            [Sample.new(0, "sample_1", "GATTACA"), Sample.new(0, "sample_2", "GATTACA")]
        )


def test_from_samples_fail_different_lengths():
    with pytest.raises(SampleError, match="All barcodes must have the same length"):
        SampleGroup.from_samples(
            [Sample.new(0, "sample_1", "GATTACA"), Sample.new(0, "sample_2", "CATGGA")]
        )


def test_display():
    s = Sample.new(2, "test-sample", "GATTACA")
    assert str(s) == "Sample(0002) - { name: test-sample\tbarcode: GATTACA }"


def test_reading_tsv_with_extra_and_reordered_columns(tmp_path):
    """fgoxide loads via csv+serde, which maps columns by header name: extra
    or reordered columns are accepted (samples.rs:144-147)."""
    p = _write(
        tmp_path,
        [
            "lane\tbarcode\tsample_id\tnotes",
            "1\tGATTACA\tsample1\thello",
            "2\tCATGCTA\tsample2\tworld",
        ],
    )
    g = SampleGroup.from_file(p)
    assert [s.sample_id for s in g.samples] == ["sample1", "sample2"]
    assert [s.barcode for s in g.samples] == ["GATTACA", "CATGCTA"]


def test_reading_tsv_missing_required_column(tmp_path):
    p = _write(tmp_path, ["sample_id\tbc", "sample1\tGATTACA"])
    with pytest.raises(SampleError, match="barcode"):
        SampleGroup.from_file(p)


def test_reading_tsv_row_field_count_mismatch(tmp_path):
    p = _write(
        tmp_path,
        [Sample.deserialize_header_line(), "sample1\tGATTACA\textra"],
    )
    with pytest.raises(SampleError, match="fields"):
        SampleGroup.from_file(p)


def test_top_level_library_surface():
    """The reference is also a library (fqtk_lib, SURVEY §2a #5-#8); the
    same names are importable from the package top level."""
    import fqtk_tpu

    m = fqtk_tpu.BarcodeMatcher(
        [fqtk_tpu.Sample("s1", "AAAA"), fqtk_tpu.Sample("s2", "CCCC")],
        max_mismatches=1,
        min_mismatch_delta=2,
    )
    match = m.assign(b"AAAT")
    assert match is not None and match.best_match == 0
    assert fqtk_tpu.decode(fqtk_tpu.encode(b"ACGTN")) == "ACGTN"
    assert str(fqtk_tpu.ReadStructure.from_str("8B+T")) == "8B+T"
    assert fqtk_tpu.is_valid_iupac(ord("R")) and not fqtk_tpu.is_valid_iupac(ord("Z"))
    assert "BitEnc" in dir(fqtk_tpu)
    with pytest.raises(AttributeError):
        fqtk_tpu.not_a_symbol
