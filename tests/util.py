"""Shared helpers for end-to-end tests: synthesize FASTQs like the reference's
test fixtures (``/root/reference/src/bin/commands/demux.rs:1018-1093``)."""

from pathlib import Path
from typing import List, Sequence, Tuple

from fqtk_tpu.io.fastq import read_fastq

SAMPLE1_BARCODE = "GATTGGG"


def fq_lines_from_bases(prefix: str, records_bases: Sequence[str]) -> List[str]:
    lines = []
    for i, bases in enumerate(records_bases):
        lines += [f"@{prefix}_{i}", bases, "+", ";" * len(bases)]
    return lines


def fastq_file(
    tmpdir: Path, filename_prefix: str, read_prefix: str, records_bases: Sequence[str]
) -> Path:
    path = Path(tmpdir) / f"{filename_prefix}.fastq"
    path.write_text("\n".join(fq_lines_from_bases(read_prefix, records_bases)) + "\n")
    return path


def metadata_file(tmpdir: Path, barcodes: Sequence[str]) -> Path:
    path = Path(tmpdir) / "metadata.tsv"
    lines = ["sample_id\tbarcode"]
    for i, b in enumerate(barcodes):
        lines.append(f"Sample{i:04d}\t{b}")
    path.write_text("\n".join(lines) + "\n")
    return path


def metadata(tmpdir: Path) -> Path:
    return metadata_file(tmpdir, [SAMPLE1_BARCODE])


def assert_records(path: Path, expected: Sequence[Tuple[bytes, bytes, bytes]]) -> None:
    recs = read_fastq(path)
    assert len(recs) == len(expected), f"{path}: {len(recs)} != {len(expected)}"
    for actual, (head, seq, qual) in zip(recs, expected):
        assert actual.head == head, f"{path}: {actual.head!r} != {head!r}"
        assert actual.seq == seq, f"{path}: {actual.seq!r} != {seq!r}"
        assert actual.qual == qual, f"{path}: {actual.qual!r} != {qual!r}"
