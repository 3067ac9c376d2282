"""Subsample tests mirroring ``/root/reference/src/bin/commands/subsample.rs:307-841``
plus ChaCha8 stream verification."""

import numpy as np
import pytest

from fqtk_tpu.io.fastq import read_fastq
from fqtk_tpu.runtime.subsample import (
    SubsampleConfig,
    SubsampleError,
    base_read_name,
    effective_seed,
    fmt_count,
    run_subsample,
)
from fqtk_tpu.utils.chacha import ChaCha8Rng, chacha_blocks, seed_from_u64

from .util import fastq_file


def test_fmt_count():
    assert fmt_count(0) == "0"
    assert fmt_count(999) == "999"
    assert fmt_count(1000) == "1,000"
    assert fmt_count(1234567) == "1,234,567"


def test_base_read_name():
    assert base_read_name(b"read1/1") == b"read1"
    assert base_read_name(b"read1/2") == b"read1"
    assert base_read_name(b"read1/3") == b"read1/3"
    assert base_read_name(b"read1 comment") == b"read1"
    assert base_read_name(b"read1\tcomment") == b"read1"
    assert base_read_name(b"read1/1 comment") == b"read1"
    assert base_read_name(b"r") == b"r"


def test_chacha8_zero_key_known_answer():
    """ChaCha8 keystream for the all-zero key/nonce (ECRYPT test vector)."""
    key = np.zeros(8, dtype=np.uint32)
    block = chacha_blocks(key, 0, 1, rounds=8)[0]
    stream = block.astype("<u4").tobytes()
    assert stream[:16].hex() == "3e00ef2f895f40d67f5bb8e81f09a5a1"
    assert stream[16:32].hex() == "2c840ec3ce9a7f3b181be188ef711a1e"


def test_chacha20_rfc_vector():
    """Same core with 20 rounds must match the original DJB/ECRYPT ChaCha20
    zero-key vector (sanity check of the round function)."""
    key = np.zeros(8, dtype=np.uint32)
    block = chacha_blocks(key, 0, 1, rounds=20)[0]
    stream = block.astype("<u4").tobytes()
    assert stream[:16].hex() == "76b8e0ada0f13d90405d6ae55386bd28"


def test_seed_from_u64_deterministic():
    a = seed_from_u64(42)
    b = seed_from_u64(42)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, seed_from_u64(43))


def test_rng_streams_contiguous():
    r1 = ChaCha8Rng(7)
    r2 = ChaCha8Rng(7)
    a = r1.next_u64_batch(1000)
    b = np.concatenate([r2.next_u64_batch(333), r2.next_u64_batch(667)])
    assert np.array_equal(a, b)


def test_f64_in_unit_interval():
    r = ChaCha8Rng(1)
    x = r.random_f64_batch(10000)
    assert (x >= 0).all() and (x < 1).all()
    assert abs(x.mean() - 0.5) < 0.02


def _run(tmp_path, inputs, fraction, seed=None, **kw):
    cfg = SubsampleConfig(
        inputs=inputs,
        output=tmp_path / "out",
        fraction=fraction,
        threads=2,
        compression_level=5,
        seed=seed,
        **kw,
    )
    return run_subsample(cfg)


def test_subsample_all(tmp_path):
    bases = [f"{'ACGT' * 3}" for _ in range(10)]
    fq = fastq_file(tmp_path, "in", "r", bases)
    res = _run(tmp_path, [fq], 1.0, seed=42)
    assert res.total_read == 10 and res.total_kept == 10
    recs = read_fastq(tmp_path / "out.R1.fq.gz")
    assert len(recs) == 10
    assert recs[0].head == b"r_0"


def test_subsample_none(tmp_path):
    fq = fastq_file(tmp_path, "in", "r", ["ACGT"] * 10)
    res = _run(tmp_path, [fq], 0.0, seed=42)
    assert res.total_kept == 0
    assert read_fastq(tmp_path / "out.R1.fq.gz") == []


def test_subsample_deterministic_with_seed(tmp_path):
    fq = fastq_file(tmp_path, "in", "r", ["ACGT"] * 100)
    r1 = _run(tmp_path, [fq], 0.5, seed=42)
    k1 = [r.head for r in read_fastq(tmp_path / "out.R1.fq.gz")]
    r2 = _run(tmp_path, [fq], 0.5, seed=42)
    k2 = [r.head for r in read_fastq(tmp_path / "out.R1.fq.gz")]
    assert k1 == k2
    assert 0 < r1.total_kept < 100
    assert r1.total_kept == r2.total_kept


def test_subsample_deterministic_without_seed(tmp_path):
    fq = fastq_file(tmp_path, "in", "r", ["ACGT"] * 100)
    r1 = _run(tmp_path, [fq], 0.5)
    r2 = _run(tmp_path, [fq], 0.5)
    assert r1.seed == r2.seed
    assert r1.total_kept == r2.total_kept


def test_subsample_paired_lockstep(tmp_path):
    n = 50
    fq1 = fastq_file(tmp_path, "r1", "q", ["AAAA"] * n)
    fq2 = fastq_file(tmp_path, "r2", "q", ["CCCC"] * n)
    _run(tmp_path, [fq1, fq2], 0.5, seed=1)
    k1 = [r.head for r in read_fastq(tmp_path / "out.R1.fq.gz")]
    k2 = [r.head for r in read_fastq(tmp_path / "out.R2.fq.gz")]
    assert k1 == k2


def test_subsample_name_mismatch_fails(tmp_path):
    fq1 = fastq_file(tmp_path, "r1", "qa", ["AAAA"] * 5)
    fq2 = fastq_file(tmp_path, "r2", "qb", ["CCCC"] * 5)
    with pytest.raises(SubsampleError, match="Read name mismatch"):
        _run(tmp_path, [fq1, fq2], 1.0, seed=1)


def test_subsample_name_mismatch_ok_when_disabled(tmp_path):
    fq1 = fastq_file(tmp_path, "r1", "qa", ["AAAA"] * 5)
    fq2 = fastq_file(tmp_path, "r2", "qb", ["CCCC"] * 5)
    _run(tmp_path, [fq1, fq2], 1.0, seed=1, disable_read_name_checking=True)


def test_subsample_out_of_sync_fails(tmp_path):
    fq1 = fastq_file(tmp_path, "r1", "q", ["AAAA"] * 5)
    fq2 = fastq_file(tmp_path, "r2", "q", ["CCCC"] * 3)
    with pytest.raises(SubsampleError, match="out of sync"):
        _run(tmp_path, [fq1, fq2], 1.0, seed=1, disable_read_name_checking=True)


def test_validation_errors_collected(tmp_path):
    cfg = SubsampleConfig(
        inputs=[tmp_path / "nope.fq"],
        output=tmp_path / "missing_dir" / "out",
        fraction=1.5,
        threads=1,
        compression_level=0,
    )
    with pytest.raises(SubsampleError) as exc:
        run_subsample(cfg)
    msg = str(exc.value)
    assert "does not exist." in msg
    assert "Fraction must be in [0.0, 1.0], got 1.5." in msg
    assert "Threads must be at least 2, got 1." in msg
    assert "Compression level must be 1-12, got 0." in msg
    assert "Output parent directory" in msg

    cfg_neg = SubsampleConfig(
        inputs=[tmp_path / "nope.fq"],
        output=tmp_path / "out",
        fraction=-0.1,
        threads=2,
    )
    with pytest.raises(SubsampleError, match=r"Fraction must be in \[0.0, 1.0\], got -0.1"):
        run_subsample(cfg_neg)


def test_effective_seed_explicit():
    cfg = SubsampleConfig(inputs=[], output="x", fraction=0.5, seed=99)
    assert effective_seed(cfg) == 99


def test_native_matches_python(tmp_path):
    """Native and pure-Python subsample paths must emit identical bytes."""
    import gzip

    from fqtk_tpu.io import native as native_io

    if not native_io.available():
        pytest.skip("native library unavailable")
    n = 500
    fq1 = fastq_file(tmp_path, "r1", "q", [f"ACGT{i%7}".replace(str(i%7), "ACGT"[i%4]) for i in range(n)])
    fq2 = fastq_file(tmp_path, "r2", "q", ["CCCC"] * n)
    for flavor, use_native in [("nat", True), ("py", False)]:
        cfg = SubsampleConfig(
            inputs=[fq1, fq2],
            output=tmp_path / f"out_{flavor}",
            fraction=0.37,
            threads=2,
            compression_level=5,
            seed=1234,
        )
        run_subsample(cfg, use_native=use_native)
    for i in (1, 2):
        a = gzip.open(tmp_path / f"out_nat.R{i}.fq.gz").read()
        b = gzip.open(tmp_path / f"out_py.R{i}.fq.gz").read()
        assert a == b and len(a) > 0


def test_native_stage_stats_exposed(tmp_path):
    """The native engine reports per-stage thread-CPU + pool byte counts
    (bench.py's host-ceiling accounting depends on this surface)."""
    from fqtk_tpu.io import native as native_io

    if not native_io.available():
        pytest.skip("native library unavailable")
    n = 400
    fq1 = fastq_file(tmp_path, "r1", "q", ["ACGTACGT"] * n)
    fq2 = fastq_file(tmp_path, "r2", "q", ["CCCCGGGG"] * n)
    cfg = SubsampleConfig(
        inputs=[fq1, fq2],
        output=tmp_path / "out",
        fraction=0.5,
        threads=2,
        seed=7,
    )
    res = run_subsample(cfg, use_native=True)
    st = res.stage_seconds
    assert st is not None
    assert st["native_work"] > 0  # inflate+scan+copy CPU was accounted
    assert st["native_compress"] > 0  # BGZF pool busy time was accounted
    assert st["native_compress_out_bytes"] > 0
    # Python path reports no native stage stats
    res_py = run_subsample(
        SubsampleConfig(
            inputs=[fq1, fq2],
            output=tmp_path / "outpy",
            fraction=0.5,
            threads=2,
            seed=7,
        ),
        use_native=False,
    )
    assert res_py.stage_seconds is None


def test_native_huge_record_verbatim(tmp_path):
    """Records larger than one BGZF block (65,280B input cap) drive the
    writer's multi-block split; kept records must survive verbatim and
    byte-match the Python engine."""
    import gzip

    from fqtk_tpu.io import native as native_io

    if not native_io.available():
        pytest.skip("native library unavailable")
    big = "G" * 200_000
    fq = fastq_file(tmp_path, "r1", "q", ["ACGT", big, "TTTT", big[:70_000]])
    for flavor, use_native in [("nat", True), ("py", False)]:
        run_subsample(
            SubsampleConfig(
                inputs=[fq],
                output=tmp_path / f"big_{flavor}",
                fraction=1.0,
                threads=2,
                seed=7,
            ),
            use_native=use_native,
        )
    a = gzip.open(tmp_path / "big_nat.R1.fq.gz").read()
    b = gzip.open(tmp_path / "big_py.R1.fq.gz").read()
    assert a == b
    assert big.encode() in a


def test_native_parallel_matches_serial(tmp_path):
    """The per-input-threaded chunk loop must emit bytes identical to the
    reference-architecture serial loop (bench.py's proxy mode), across
    uneven record sizes and a mask that spans chunk boundaries."""
    import gzip

    from fqtk_tpu.io import native as native_io
    from fqtk_tpu.utils.chacha import ChaCha8Rng

    if not native_io.available():
        pytest.skip("native library unavailable")
    n = 700
    fq1 = fastq_file(tmp_path, "r1", "q", ["ACGTAC" * (1 + i % 5) for i in range(n)])
    fq2 = fastq_file(tmp_path, "r2", "q", ["CCGG" * (1 + i % 3) for i in range(n)])
    for tag, parallel in [("ser", False), ("par", True)]:
        rng = ChaCha8Rng(99)
        eng = native_io.NativeSubsampleEngine(threads=3, compression_level=5)
        eng.add_input(fq1, tmp_path / f"{tag}.R1.fq.gz")
        eng.add_input(fq2, tmp_path / f"{tag}.R2.fq.gz")
        eng.configure(check_names=True, parallel=parallel)
        total = 0
        while True:
            mask = (rng.random_f64_batch(64) < 0.4).astype("uint8")
            c, _ = eng.process_chunk(mask)
            total += c
            if c < len(mask):
                break
        assert eng.finish() or True
        eng.close()
        assert total == n
    for i in (1, 2):
        a = gzip.open(tmp_path / f"ser.R{i}.fq.gz").read()
        b = gzip.open(tmp_path / f"par.R{i}.fq.gz").read()
        assert a == b and len(a) > 0


def test_native_parallel_out_of_sync(tmp_path):
    """Sync failure detection + message parity through the parallel loop."""
    from fqtk_tpu.io import native as native_io

    if not native_io.available():
        pytest.skip("native library unavailable")
    fq1 = fastq_file(tmp_path, "r1", "q", ["AAAA"] * 9)
    fq2 = fastq_file(tmp_path, "r2", "q", ["CCCC"] * 5)
    cfg = SubsampleConfig(
        inputs=[fq1, fq2], output=tmp_path / "o", fraction=1.0, seed=1,
        disable_read_name_checking=True,
    )
    with pytest.raises(SubsampleError, match="out of sync.*read 6"):
        run_subsample(cfg)


def test_native_name_mismatch(tmp_path):
    from fqtk_tpu.io import native as native_io

    if not native_io.available():
        pytest.skip("native library unavailable")
    fq1 = fastq_file(tmp_path, "r1", "qa", ["AAAA"] * 5)
    fq2 = fastq_file(tmp_path, "r2", "qb", ["CCCC"] * 5)
    cfg = SubsampleConfig(
        inputs=[fq1, fq2], output=tmp_path / "o", fraction=1.0, seed=1
    )
    with pytest.raises(SubsampleError, match="Read name mismatch"):
        run_subsample(cfg)


def test_chacha_composition_cross_validated_native():
    """The full seed_from_u64 -> ChaCha8 -> u64 -> f64 composition, checked
    against an independently written scalar C++ implementation
    (``native/fqtk_io.cpp`` chacha_verify).  Two from-scratch implementations
    of the rand/rand_chacha spec agreeing guards against transcription slips
    in either (no Rust toolchain exists in this image to emit true golden
    vectors; see docs/PARITY.md)."""
    import ctypes

    import numpy as np

    from fqtk_tpu.io import native as native_io
    from fqtk_tpu.utils.chacha import ChaCha8Rng

    if not native_io.available():
        pytest.skip("native library unavailable")
    lib = native_io.get_lib()
    lib.fqtk_chacha8_verify_u64.argtypes = [
        ctypes.c_uint64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.fqtk_chacha8_verify_f64.argtypes = [
        ctypes.c_uint64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    n = 100_003  # crosses many block and refill boundaries
    for seed in (0, 1, 42, 2**64 - 1, 0x123456789ABCDEF0):
        expect_u = np.zeros(n, dtype=np.uint64)
        lib.fqtk_chacha8_verify_u64(
            seed, n, expect_u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
        )
        got_u = ChaCha8Rng(seed).next_u64_batch(n)
        assert np.array_equal(got_u, expect_u), f"u64 stream diverges, seed={seed}"
        expect_f = np.zeros(n, dtype=np.float64)
        lib.fqtk_chacha8_verify_f64(
            seed, n, expect_f.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        got_f = ChaCha8Rng(seed).random_f64_batch(n)
        assert np.array_equal(got_f, expect_f), f"f64 stream diverges, seed={seed}"


def test_native_mask_stream_bit_identical_to_numpy_rng():
    """The production mask generator (``fqtk_rng_keep_mask``, stateful,
    used by the subsample mask producer) emits bit-identical keep masks to
    the NumPy ChaCha8Rng driven as ``random_f64_batch(n) < fraction`` —
    across odd chunk sizes that leave partial blocks between calls (the
    progress-log boundary path takes non-multiple-of-8 sizes)."""
    from fqtk_tpu.io import native as native_io
    from fqtk_tpu.utils.chacha import ChaCha8Rng

    if not native_io.available():
        pytest.skip("native library unavailable")
    takes = [1, 7, 64, 3, 1 << 13, 5, 999, 2, 4096, 11]
    for seed in (0, 7, 2**63 + 12345):
        for fraction in (0.0, 0.3, 0.5, 1.0, 0.001):
            try:
                nat = native_io.NativeChaChaMask(seed)
            except native_io.NativeDemuxError:
                pytest.skip("native rng export unavailable (stale .so)")
            ref = ChaCha8Rng(seed)
            for take in takes:
                got = nat.keep_mask(take, fraction)
                want = (ref.random_f64_batch(take) < fraction).astype("uint8")
                assert np.array_equal(got, want), (
                    f"mask diverges: seed={seed} fraction={fraction} take={take}"
                )
            nat.close()


def test_native_subsample_progress_lines(tmp_path, caplog, monkeypatch):
    """The native path emits the reference's 5M-interval progress lines with
    exact boundary counts (subsample.rs:224,277-285); cadence shrunk for the
    test via PROGRESS_LOG_UNIT."""
    import gzip
    import logging

    from fqtk_tpu.runtime import subsample as ss

    monkeypatch.setattr(ss, "PROGRESS_LOG_UNIT", 8)
    p = tmp_path / "in.fq.gz"
    with gzip.open(p, "wb") as fh:
        for i in range(20):
            fh.write(f"@r{i}\nACGT\n+\nIIII\n".encode())
    with caplog.at_level(logging.INFO, logger="fqtk"):
        res = ss.run_subsample(
            ss.SubsampleConfig(inputs=[p], output=tmp_path / "o", fraction=1.0, seed=1)
        )
    assert res.total_read == 20
    lines = [r.message for r in caplog.records if "Read 8 record sets" in r.message]
    assert lines, caplog.text
    assert any("Read 16 record sets" in r.message for r in caplog.records)


@pytest.mark.parametrize("use_native", [True, False])
def test_subsample_empty_input(tmp_path, use_native):
    """Zero-record inputs finish cleanly with empty (EOF-block-only) outputs
    (mirrors the reference's test_empty_input)."""
    import gzip

    p = tmp_path / "empty.fq.gz"
    with gzip.open(p, "wb"):
        pass
    from fqtk_tpu.runtime.subsample import SubsampleConfig, run_subsample

    res = run_subsample(
        SubsampleConfig(inputs=[p], output=tmp_path / "o", fraction=0.5, seed=1),
        use_native=use_native,
    )
    assert res.total_read == 0 and res.total_kept == 0
    assert gzip.decompress((tmp_path / "o.R1.fq.gz").read_bytes()) == b""


@pytest.mark.parametrize("use_native", [False, True])
def test_subsample_fifo_input_streams(tmp_path, use_native):
    """Named-pipe inputs stream without seeking, matching file-based runs."""
    import os
    import threading

    from fqtk_tpu.io import native as native_io

    if use_native and not native_io.available():
        pytest.skip("native library unavailable")

    bases = ["ACGTACGT" for _ in range(50)]
    src = fastq_file(tmp_path, "src", "r", bases)
    cfg_file = SubsampleConfig(
        inputs=[src], output=tmp_path / "f", fraction=0.5, seed=7, threads=2
    )
    run_subsample(cfg_file, use_native=use_native)

    fifo = tmp_path / "in.fifo"
    os.mkfifo(fifo)
    payload = src.read_bytes()

    def feed():
        with open(fifo, "wb") as fh:
            fh.write(payload)

    t = threading.Thread(target=feed)
    t.start()
    try:
        cfg_fifo = SubsampleConfig(
            inputs=[fifo], output=tmp_path / "p", fraction=0.5, seed=7, threads=2
        )
        run_subsample(cfg_fifo, use_native=use_native)
    finally:
        t.join(timeout=30)
    assert not t.is_alive()

    a = read_fastq(tmp_path / "f.R1.fq.gz")
    b = read_fastq(tmp_path / "p.R1.fq.gz")
    assert a == b and len(a) > 0
