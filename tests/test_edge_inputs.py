"""Deterministic edge-input regressions, each compared native-vs-numpy.

Covers FASTQ shapes that randomized fuzzing rarely synthesizes but real
pipelines produce: quality strings whose first byte is '@' or '+' (the
classic trap for heuristic FASTQ parsers — the reference's seq_io parser
is record-structured and immune, demux.rs:16-17, and so must both of our
engines be), a K=1 whitelist with a 1bp barcode (degenerate top-2: there
is no second-best candidate, barcode_matching.rs:119-147), multi-kilobase
reads (arena/buffer growth paths), and an empty (zero-record) gzip input.
"""

import gzip

from fqtk_tpu.runtime.demux import DemuxConfig, run_demux


def _run_both(tmp_path, inputs, structures, meta, **kw):
    outs = {}
    for engine in ("native", "numpy"):
        out = tmp_path / f"out_{engine}"
        cfg = DemuxConfig(
            inputs=inputs,
            read_structures=structures,
            sample_metadata=meta,
            output=out,
            engine=engine,
            **kw,
        )
        run_demux(cfg)
        outs[engine] = out
    files_n = sorted(p.name for p in outs["native"].glob("*.fq.gz"))
    files_p = sorted(p.name for p in outs["numpy"].glob("*.fq.gz"))
    assert files_n == files_p
    for name in files_n:
        a = gzip.open(outs["native"] / name).read()
        b = gzip.open(outs["numpy"] / name).read()
        assert a == b, f"{name} differs between engines"
    m_n = (outs["native"] / "demux-metrics.txt").read_text()
    m_p = (outs["numpy"] / "demux-metrics.txt").read_text()
    assert m_n == m_p
    return outs["native"]


def _meta(tmp_path, barcodes):
    meta = tmp_path / "meta.tsv"
    meta.write_text(
        "sample_id\tbarcode\n"
        + "".join(f"S{i}\t{b}\n" for i, b in enumerate(barcodes))
    )
    return meta


def test_quality_line_starting_with_at_and_plus(tmp_path):
    """Quality strings may begin with '@' or '+'; the parser must not
    mistake them for a new record header or separator."""
    bc = "AAAAAAAAGATTACAGA"
    seq = bc + "ACGT" * 10
    qual = "@" + "+@" * ((len(seq) - 1) // 2)
    fq = tmp_path / "in.fq.gz"
    with gzip.open(fq, "wb") as f:
        for i in range(200):
            f.write(f"@r{i} 1:N:0:0\n{seq}\n+\n{qual}\n".encode())
    out = _run_both(tmp_path, [fq], ["17B+T"], _meta(tmp_path, [bc]))
    recs = gzip.open(out / "S0.R1.fq.gz").read().split(b"\n")
    assert recs[0] == b"@r0 1:N:0:" + bc.encode()
    # template quality = input quality with the 17 barcode chars removed
    assert recs[3] == qual[17:].encode()


def test_single_sample_one_base_barcode(tmp_path):
    """K=1 whitelist with a 1bp barcode: no second-best exists, so the
    min-delta gate must pass vacuously and every 'A' read routes to S0."""
    fq = tmp_path / "in.fq.gz"
    with gzip.open(fq, "wb") as f:
        for i in range(100):
            base = "A" if i % 4 else "C"  # 25 reads mismatch
            f.write(f"@r{i}\n{base}{'CGT' * 33}\n+\n{'I' * 100}\n".encode())
    out = _run_both(
        tmp_path, [fq], ["1B+T"], _meta(tmp_path, ["A"]), max_mismatches=0
    )
    metrics = (out / "demux-metrics.txt").read_text().splitlines()
    row = dict(zip(metrics[0].split("\t"), metrics[1].split("\t")))
    assert row["sample_id"] == "S0" and row["templates"] == "75"


def test_multi_kilobase_reads(tmp_path):
    """10kb reads exercise the scanner's buffer/arena growth paths."""
    bc = "AAAAAAAAGATTACAGA"
    seq = bc + "ACGT" * 2500
    fq = tmp_path / "in.fq.gz"
    with gzip.open(fq, "wb") as f:
        for i in range(50):
            f.write(f"@r{i} 1:N:0:0\n{seq}\n+\n{'I' * len(seq)}\n".encode())
    out = _run_both(tmp_path, [fq], ["17B+T"], _meta(tmp_path, [bc]))
    recs = gzip.open(out / "S0.R1.fq.gz").read().split(b"\n")
    assert len(recs[1]) == len(seq) - 17


def test_nocall_spellings_in_metadata_barcodes(tmp_path):
    """The reference accepts 'n' and '.' in sample barcodes (both are
    no-call spellings, samples.rs:53-55 via is_valid_iupac, mod.rs:90-92)
    and encodes them to the all-bases mask, so any observed base matches
    at that position (bitenc.rs:441)."""
    meta = tmp_path / "meta.tsv"
    meta.write_text(
        "sample_id\tbarcode\n"
        "S0\tAAAAAAAAGATTACAG.\n"
        "S1\tCCCCCCCCGATTACAGn\n"
    )
    fq = tmp_path / "in.fq.gz"
    with gzip.open(fq, "wb") as f:
        for i in range(40):
            bc = "AAAAAAAAGATTACAGT" if i % 2 else "CCCCCCCCGATTACAGT"
            f.write(f"@r{i} 1:N:0:0\n{bc}ACGTACGT\n+\n{'I' * 25}\n".encode())
    out = _run_both(tmp_path, [fq], ["17B+T"], meta, max_mismatches=0)
    metrics = (out / "demux-metrics.txt").read_text().splitlines()
    counts = {r.split("\t")[0]: r.split("\t")[2] for r in metrics[1:]}
    assert counts == {"S0": "20", "S1": "20", "unmatched": "0"}


def test_empty_gzip_input(tmp_path):
    """A valid gzip stream with zero FASTQ records: clean empty outputs,
    all metric counts zero."""
    fq = tmp_path / "in.fq.gz"
    with gzip.open(fq, "wb"):
        pass
    bc = "AAAAAAAAGATTACAGA"
    out = _run_both(tmp_path, [fq], ["17B+T"], _meta(tmp_path, [bc]))
    assert gzip.open(out / "S0.R1.fq.gz").read() == b""
    metrics = (out / "demux-metrics.txt").read_text().splitlines()
    assert all(r.split("\t")[2] == "0" for r in metrics[1:])


def test_header_trailing_space_fails_both_engines(tmp_path):
    # "@name " has an empty comment: the reference panics in
    # write_header_internal (`chars.last().unwrap()`, demux.rs:231).  Both
    # engines must fail the run with the shared contract message rather
    # than silently emitting "name :".
    src = tmp_path / "r.fastq"
    src.write_text("@q1 \nGATTGGGA\n+\n;;;;;;;;\n")
    meta = _meta(tmp_path, ["GATTGGG"])
    for engine in ("native", "numpy"):
        out = tmp_path / f"out_sp_{engine}"
        cfg = DemuxConfig(
            inputs=[src],
            read_structures=["7B+T"],
            sample_metadata=meta,
            output=out,
            engine=engine,
        )
        try:
            run_demux(cfg)
            raise AssertionError(f"{engine}: empty-comment header accepted")
        except AssertionError:
            raise
        except Exception as exc:  # DemuxError (native) / HeaderError (numpy)
            assert "Header comment is empty" in str(exc), (engine, exc)


def test_header_degenerate_four_part_comment_both_engines(tmp_path):
    # ":::" and ":::5" are 4-part comments with empty fields; the engines
    # must agree byte-for-byte on the rewrite (remainder "::", no '+')
    src = tmp_path / "r.fastq"
    src.write_text(
        "@q1 :::\nGATTGGGA\n+\n;;;;;;;;\n@q2 :::5\nGATTGGGC\n+\n;;;;;;;;\n"
    )
    meta = _meta(tmp_path, ["GATTGGG"])
    out = _run_both(tmp_path, [src], ["7B+T"], meta)
    data = gzip.open(out / "S0.R1.fq.gz").read()
    assert b"@q1 1:::GATTGGG\n" in data
    assert b"@q2 1:::GATTGGG\n" in data
