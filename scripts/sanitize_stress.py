"""High-volume concurrency stress for sanitizer runs (scripts/sanitize.sh).

The differential-fuzz suites exercise correctness on small inputs; this
script drives the native engine's full thread topology at volume so TSan
has real interleavings to observe:

- demux: 2-input paired run, ~120K reads, small batch (4K) so the 4-slot
  window ring wraps many times with parse / matcher / route / compressor
  threads all live; the threaded small-K host matcher runs inside the loop.
- subsample: ~200K reads through the native SubsampleEngine (reader threads
  + pooled BGZF writers).
- big-K matcher: a 100K-barcode pigeonhole build + threaded assign.

Exercises the same code paths as production (run_demux / run_subsample with
engine defaults), not a side harness.
"""

import os
import sys
import tempfile
from pathlib import Path

# Run as a bare script (`python scripts/sanitize_stress.py`), so sys.path[0]
# is scripts/ — make the repo root importable regardless of install state.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def _write_fastq_gz(path: Path, n: int, seq_of) -> None:
    from fqtk_tpu.io import native as native_io

    w = native_io.NativeBgzfWriter(str(path), 1, threads=2)
    chunk = []
    for i in range(n):
        s = seq_of(i)
        chunk.append(b"@r%d 1:N:0:0\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
        if len(chunk) == 10_000:
            w.write(b"".join(chunk))
            chunk.clear()
    if chunk:
        w.write(b"".join(chunk))
    w.close()


def stress_demux(tmp: Path) -> None:
    from fqtk_tpu.runtime.demux import DemuxConfig, run_demux

    rng = np.random.default_rng(5)
    k, blen, n = 24, 12, 120_000
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    bcs = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=blen))
           for _ in range(k)]
    bcs = sorted(set(bcs))
    meta = tmp / "meta.tsv"
    meta.write_text(
        "sample_id\tbarcode\n"
        + "".join(f"s{i}\t{b}\n" for i, b in enumerate(bcs))
    )
    choice = rng.integers(0, len(bcs), size=n)
    noise = rng.integers(0, 8, size=n)
    tmpl = bytes(letters[rng.integers(0, 4, size=60)])

    def seq1(i):
        b = bytearray(bcs[choice[i]].encode())
        if noise[i] == 0:
            b[i % blen] = ord("N")
        return bytes(b) + tmpl

    _write_fastq_gz(tmp / "r1.fq.gz", n, seq1)
    _write_fastq_gz(tmp / "r2.fq.gz", n, lambda i: tmpl)
    res = run_demux(
        DemuxConfig(
            inputs=[tmp / "r1.fq.gz", tmp / "r2.fq.gz"],
            read_structures=[f"{blen}B+T", "+T"],
            sample_metadata=meta,
            output=tmp / "out",
            batch_size=4096,
            engine="native",
            threads=8,
        )
    )
    assert res.total_templates == n, res.total_templates
    print(f"demux stress: {n} reads ok", flush=True)


def stress_longreads(tmp: Path) -> None:
    """Multi-kilobase, variable-length reads: exercises the scanner's
    slot-arena growth and the writers' block-buffer resize paths, which
    the short-read stress never leaves cold."""
    from fqtk_tpu.runtime.demux import DemuxConfig, run_demux

    rng = np.random.default_rng(11)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    bcs = ["AACCGGTTAACCGGTT", "TTGGCCAATTGGCCAA"]
    meta = tmp / "meta_long.tsv"
    meta.write_text(
        "sample_id\tbarcode\n"
        + "".join(f"s{i}\t{b}\n" for i, b in enumerate(bcs))
    )
    lens = rng.integers(2_000, 12_000, size=3_000)

    def seq(i):
        body = bytes(letters[rng.integers(0, 4, size=int(lens[i]))])
        return bcs[i % 2].encode() + body

    _write_fastq_gz(tmp / "long1.fq.gz", len(lens), seq)
    res = run_demux(
        DemuxConfig(
            inputs=[tmp / "long1.fq.gz"],
            read_structures=["16B+T"],
            sample_metadata=meta,
            output=tmp / "out_long",
            batch_size=512,
            engine="native",
            threads=8,
        )
    )
    assert res.total_templates == len(lens), res.total_templates
    print(f"long-read stress: {len(lens)} reads (2-12kb) ok", flush=True)


def stress_subsample(tmp: Path) -> None:
    from fqtk_tpu.runtime.subsample import SubsampleConfig, run_subsample

    n = 200_000
    _write_fastq_gz(tmp / "s1.fq.gz", n, lambda i: b"ACGTACGTACGTACGTACGT")
    res = run_subsample(
        SubsampleConfig(
            inputs=[tmp / "s1.fq.gz"],
            output=tmp / "sub",
            fraction=0.37,
            seed=9,
        ),
        use_native=True,
    )
    assert res.total_read == n, res.total_read
    print(f"subsample stress: {n} reads, kept {res.total_kept}", flush=True)


def stress_bigk() -> None:
    from fqtk_tpu.io import native as native_io

    rng = np.random.default_rng(1)
    k, length = 100_000, 16
    vals = rng.choice(1 << 31, size=k + 500, replace=False)[:k].astype(np.uint32)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    codes = np.zeros((k, length), dtype=np.uint8)
    v = vals.copy()
    for j in range(length):
        codes[:, j] = v & 3
        v >>= 2
    bc_bytes = letters[codes]
    barcodes = [bytes(r).decode() for r in bc_bytes]
    m = native_io.NativeBigKMatcher(barcodes, 1, 2, threads=4)
    obs = bc_bytes[rng.integers(0, k, size=50_000)].copy()
    from fqtk_tpu.core.encoding import ENCODE_LUT

    masks = ENCODE_LUT[obs].astype(np.uint8)
    packed = (masks[:, 0::2] | (masks[:, 1::2] << 4)).astype(np.uint8)
    out = m.assign(packed)
    m.close()
    assert (out < k).mean() > 0.99
    print("big-K stress: 50K assigns over 100K barcodes ok", flush=True)


def main() -> int:
    with tempfile.TemporaryDirectory() as td:
        stress_demux(Path(td))
        stress_longreads(Path(td))
        stress_subsample(Path(td))
    stress_bigk()
    print("sanitize_stress: all ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
