"""CLI surface tests: flags, dispatch, error reporting."""

import gzip

import pytest

from fqtk_tpu.cli import main

from .util import fastq_file, metadata_file


def test_version(capsys):
    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert "fqtk-tpu" in capsys.readouterr().out


def test_demux_cli_roundtrip(tmp_path):
    meta = metadata_file(tmp_path, ["AAAA", "CCCC"])
    fq = fastq_file(tmp_path, "in", "ex", ["AAAA" + "G" * 10, "CCCC" + "T" * 10])
    out = tmp_path / "out"
    rc = main(
        [
            "demux",
            "-i", str(fq),
            "-r", "4B+T",
            "-s", str(meta),
            "-o", str(out),
            "--engine", "numpy",
        ]
    )
    assert rc == 0
    with gzip.open(out / "Sample0000.R1.fq.gz") as fh:
        assert fh.read() == b"@ex_0 1:N:0:AAAA\nGGGGGGGGGG\n+\n;;;;;;;;;;\n"
    assert (out / "demux-metrics.txt").exists()


def test_demux_cli_error_is_clean(tmp_path, capsys):
    meta = metadata_file(tmp_path, ["AAAA"])
    rc = main(
        [
            "demux",
            "-i", str(tmp_path / "missing.fq"),
            "-r", "4B",
            "-s", str(meta),
            "-o", str(tmp_path / "o"),
            "--engine", "numpy",
        ]
    )
    assert rc == 1
    err = capsys.readouterr().err
    assert "doesn't exist" in err
    assert "Traceback" not in err


def test_demux_cli_bad_structure_clean(tmp_path, capsys):
    meta = metadata_file(tmp_path, ["AAAA"])
    fq = fastq_file(tmp_path, "in", "ex", ["AAAAG"])
    rc = main(
        ["demux", "-i", str(fq), "-r", "4X", "-s", str(meta), "-o", str(tmp_path / "o")]
    )
    assert rc == 1
    assert "Invalid segment type: X" in capsys.readouterr().err


def test_subsample_cli_roundtrip(tmp_path):
    fq = fastq_file(tmp_path, "in", "r", ["ACGT"] * 20)
    rc = main(
        [
            "subsample",
            "-i", str(fq),
            "-o", str(tmp_path / "sub"),
            "-f", "1.0",
            "--seed", "3",
        ]
    )
    assert rc == 0
    with gzip.open(tmp_path / "sub.R1.fq.gz") as fh:
        assert fh.read().count(b"@") == 20


def test_subsample_cli_validation_error(tmp_path, capsys):
    rc = main(
        ["subsample", "-i", str(tmp_path / "nope.fq"), "-o", str(tmp_path / "s"), "-f", "2.0"]
    )
    assert rc == 1
    err = capsys.readouterr().err
    assert "Fraction must be in [0.0, 1.0]" in err


@pytest.mark.parametrize("sub", ["demux", "subsample"])
def test_per_subcommand_version(sub, capsys):
    """Each subcommand exposes --version, as clap's #[command(version)]
    derives on the reference's Demux/Subsample structs."""
    from fqtk_tpu import __version__
    from fqtk_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main([sub, "--version"])
    assert e.value.code == 0
    assert __version__ in capsys.readouterr().out


def test_skip_reasons_bare_flag_is_parse_error(capsys):
    """A bare -S must fail at parse time like clap's Vec<SkipReason> — an
    empty list would silently disable skipping."""
    from fqtk_tpu.cli import main

    with pytest.raises(SystemExit) as exc:
        main(["demux", "-i", "x", "-r", "8B", "-s", "m", "-o", "o", "-S"])
    assert exc.value.code == 2
    assert "expected at least one argument" in capsys.readouterr().err
