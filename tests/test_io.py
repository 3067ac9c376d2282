"""FASTQ reader and BGZF writer tests."""

import gzip
import struct

import pytest

from fqtk_tpu.io.fastq import (
    _BGZF_EOF,
    BgzfWriter,
    FastqParseError,
    read_fastq,
)


def test_bgzf_roundtrip(tmp_path):
    p = tmp_path / "x.gz"
    data = b"hello bgzf world\n" * 1000
    with BgzfWriter(p, 5) as w:
        w.write(data)
    with gzip.open(p, "rb") as fh:
        assert fh.read() == data


def test_bgzf_empty_file_has_eof_block(tmp_path):
    p = tmp_path / "x.gz"
    BgzfWriter(p, 5).close()
    raw = p.read_bytes()
    assert raw == _BGZF_EOF
    with gzip.open(p, "rb") as fh:
        assert fh.read() == b""


def test_bgzf_blocks_are_valid(tmp_path):
    p = tmp_path / "x.gz"
    data = bytes(range(256)) * 2000  # > one block
    with BgzfWriter(p, 5) as w:
        w.write(data)
    raw = p.read_bytes()
    # walk BGZF members via BSIZE fields
    pos = 0
    members = 0
    while pos < len(raw):
        assert raw[pos : pos + 2] == b"\x1f\x8b"
        bsize = struct.unpack("<H", raw[pos + 16 : pos + 18])[0]
        pos += bsize + 1
        members += 1
    assert pos == len(raw)
    assert members >= 3  # >= 2 data blocks + EOF
    with gzip.open(p, "rb") as fh:
        assert fh.read() == data


def test_bgzf_compresses_incompressible(tmp_path):
    import random

    random.seed(0)
    data = bytes(random.getrandbits(8) for _ in range(200_000))
    p = tmp_path / "x.gz"
    with BgzfWriter(p, 1) as w:
        w.write(data)
    with gzip.open(p, "rb") as fh:
        assert fh.read() == data


def test_fastq_reader_plain(tmp_path):
    p = tmp_path / "t.fq"
    p.write_bytes(b"@r1 comment\nACGT\n+\nIIII\n@r2\nGG\n+r2\n##\n")
    recs = read_fastq(p)
    assert recs[0].head == b"r1 comment"
    assert recs[0].seq == b"ACGT"
    assert recs[0].qual == b"IIII"
    assert recs[1].head == b"r2"
    assert recs[1].seq == b"GG"


def test_fastq_reader_gzip(tmp_path):
    p = tmp_path / "t.fq.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(b"@r1\nACGT\n+\nIIII\n")
    recs = read_fastq(p)
    assert recs[0].seq == b"ACGT"


def test_fastq_reader_crlf(tmp_path):
    p = tmp_path / "t.fq"
    p.write_bytes(b"@r1\r\nACGT\r\n+\r\nIIII\r\n")
    recs = read_fastq(p)
    assert recs[0].head == b"r1"
    assert recs[0].seq == b"ACGT"


def test_fastq_reader_strips_exactly_one_cr(tmp_path):
    """Exactly one trailing CR is consumed (native-scanner semantics): a
    line BODY ending in literal '\\r' bytes survives, it is not rstrip'd."""
    p = tmp_path / "t.fq"
    p.write_bytes(b"@r1\r\r\nACG\r\r\n+\r\nIII\r\r\n")
    recs = read_fastq(p)
    assert recs[0].head == b"r1\r"
    assert recs[0].seq == b"ACG\r"
    assert recs[0].qual == b"III\r"


def test_fastq_reader_malformed_header(tmp_path):
    p = tmp_path / "t.fq"
    p.write_bytes(b"r1\nACGT\n+\nIIII\n")
    with pytest.raises(FastqParseError, match="must start with '@'"):
        read_fastq(p)


def test_fastq_reader_truncated(tmp_path):
    p = tmp_path / "t.fq"
    p.write_bytes(b"@r1\nACGT\n+\n")
    with pytest.raises(FastqParseError, match="truncated"):
        read_fastq(p)


def test_fastq_reader_length_mismatch(tmp_path):
    p = tmp_path / "t.fq"
    p.write_bytes(b"@r1\nACGT\n+\nII\n")
    with pytest.raises(FastqParseError, match="lengths differ"):
        read_fastq(p)


def test_native_bgzf_ordering_stress(tmp_path):
    """Pool ordering invariant: many blocks compressed by racing workers must
    land strictly in submission order."""
    from fqtk_tpu.io import native as native_io

    if not native_io.available():
        pytest.skip("native library unavailable")
    p = tmp_path / "stress.gz"
    chunks = [bytes([i % 251]) * 70_000 for i in range(64)]  # > 1 block each
    w = native_io.NativeBgzfWriter(p, compression_level=1, threads=4)
    for c in chunks:
        w.write(c)
    w.close()
    with gzip.open(p, "rb") as fh:
        assert fh.read() == b"".join(chunks)


def test_bgzf_input_fast_path_demux(tmp_path):
    """BGZF inputs take the libdeflate whole-block path; outputs must equal
    the plain-gzip (zlib streaming) path byte for byte."""
    from fqtk_tpu.io import native as native_io
    from fqtk_tpu.runtime.demux import DemuxConfig, run_demux

    if not native_io.available():
        pytest.skip("native library unavailable")
    (tmp_path / "meta.tsv").write_text("sample_id\tbarcode\nsA\tAAAA\nsB\tCCCC\n")
    recs = []
    for i in range(3000):
        bc = b"AAAA" if i % 2 == 0 else (b"CCCC" if i % 3 else b"TTTT")
        recs.append(b"@r%d c\n" % i + bc + b"GGGGGGGG\n+\n" + b"I" * 12 + b"\n")
    blob = b"".join(recs)
    w = native_io.NativeBgzfWriter(tmp_path / "in_bgzf.fq.gz", 5, threads=2)
    w.write(blob)
    w.close()
    with gzip.open(tmp_path / "in_gz.fq.gz", "wb") as fh:
        fh.write(blob)
    for name in ("bgzf", "gz"):
        cfg = DemuxConfig(
            inputs=[tmp_path / f"in_{name}.fq.gz"],
            read_structures=["4B+T"],
            sample_metadata=tmp_path / "meta.tsv",
            output=tmp_path / f"out_{name}",
            engine="native",
            batch_size=512,
        )
        res = run_demux(cfg)
        assert res.total_templates == 3000
    for f in sorted((tmp_path / "out_bgzf").glob("*.fq.gz")):
        assert gzip.open(f).read() == gzip.open(tmp_path / "out_gz" / f.name).read()


def test_bgzf_decode_ahead_parallel_inflate(tmp_path, monkeypatch):
    """A multi-block BGZF input through the single-input demux path with
    block-parallel decode-ahead forced on (opt-in since the r4 A/B measured
    it slower at 4 cores — FQTK_DECODE_THREADS) must produce byte-identical
    output to the python engine's streaming read."""
    from fqtk_tpu.io import native as native_io
    from fqtk_tpu.runtime.demux import DemuxConfig, run_demux

    if not native_io.available():
        pytest.skip("native library unavailable")
    monkeypatch.setenv("FQTK_DECODE_THREADS", "3")
    p = tmp_path / "in.fq.gz"
    w = native_io.NativeBgzfWriter(p, 1, threads=2)
    n = 20_000  # ~3MB decompressed -> dozens of BGZF blocks
    for i in range(n):
        w.write(b"@r%d 1:N:0:0\nAAAATTTTGGGGCCCC\n+\nIIIIIIIIIIIIIIII\n" % i)
    w.close()
    meta = tmp_path / "m.tsv"
    meta.write_text("sample_id\tbarcode\nsA\tAAAATTTT\n")

    outs = {}
    for engine in ("native", "numpy"):
        out = tmp_path / f"out_{engine}"
        res = run_demux(
            DemuxConfig(
                inputs=[p],
                read_structures=["8B+T"],
                sample_metadata=meta,
                output=out,
                batch_size=4096,
                engine=engine,
                devices=1,
            )
        )
        assert res.total_templates == n
        outs[engine] = gzip.decompress((out / "sA.R1.fq.gz").read_bytes())
    assert outs["native"] == outs["numpy"]
    assert outs["native"].count(b"\n") == 4 * n


def test_pipe_ramp_byte_identity(tmp_path, monkeypatch):
    """FQTK_PIPE_RAMP=1 (fractional first windows — opt-in since the r4
    A/B measured it a ~5% loss at 4 cores) must not change output bytes:
    window boundaries are invisible to routing."""
    from fqtk_tpu.io import native as native_io
    from fqtk_tpu.runtime.demux import DemuxConfig, run_demux

    if not native_io.available():
        pytest.skip("native library unavailable")
    p = tmp_path / "in.fq.gz"
    w = native_io.NativeBgzfWriter(p, 1, threads=2)
    n = 30_000  # > 3 ramp windows at batch_size=8192 (1024/2048/4096/8192…)
    for i in range(n):
        bc = b"AAAATTTT" if i % 3 else b"CCCCGGGG"
        w.write(b"@r%d 1:N:0:0\n%sGGGGCCCC\n+\nIIIIIIIIIIIIIIII\n" % (i, bc))
    w.close()
    meta = tmp_path / "m.tsv"
    meta.write_text("sample_id\tbarcode\nsA\tAAAATTTT\nsB\tCCCCGGGG\n")

    outs = {}
    for tag, ramp in (("ramp", "1"), ("plain", "0")):
        monkeypatch.setenv("FQTK_PIPE_RAMP", ramp)
        out = tmp_path / f"out_{tag}"
        res = run_demux(
            DemuxConfig(
                inputs=[p],
                read_structures=["8B+T"],
                sample_metadata=meta,
                output=out,
                batch_size=8192,
                engine="native",
                devices=1,
            )
        )
        assert res.total_templates == n
        outs[tag] = tuple(
            gzip.decompress((out / f"s{s}.R1.fq.gz").read_bytes())
            for s in "AB"
        )
    assert outs["ramp"] == outs["plain"]


def test_bgzf_writer_surfaces_short_writes():
    """A write failure (ENOSPC — /dev/full) must FAIL the writer close, not
    silently truncate output; the reference's io::Result plumbing gives it
    the same guarantee."""
    import os

    from fqtk_tpu.io import native as native_io

    if not native_io.available():
        pytest.skip("native library unavailable")
    if not os.path.exists("/dev/full"):
        pytest.skip("/dev/full not available")
    w = native_io.NativeBgzfWriter("/dev/full", compression_level=5, threads=2)
    w.write(b"@r\nACGT\n+\nIIII\n" * 5000)
    with pytest.raises(native_io.NativeDemuxError):
        w.close()


def test_python_bgzf_writer_surfaces_short_writes():
    import os

    if not os.path.exists("/dev/full"):
        pytest.skip("/dev/full not available")
    w = BgzfWriter("/dev/full", compression_level=5)
    with pytest.raises(OSError):
        w.write(b"@r\nACGT\n+\nIIII\n" * 50000)
        w.close()
