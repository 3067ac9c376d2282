"""Small-K brute-force host matcher: differential fuzz vs the NumPy spec.

The C++ ``SmallKMatcher`` (nibble-mask u64 scan; the auto policy's answer
when the per-batch device round-trip would dominate tiny whitelists) must
agree with ``assign_batch_np`` — the validated spec of the reference's
``BarcodeMatcher::assign`` (barcode_matching.rs:119-159) — on every read,
including IUPAC-ambiguous whitelists (which the pigeonhole matcher rejects),
ties, no-call budgets with N-containing expected barcodes, and odd/multi-
block lengths.
"""

import gzip

import numpy as np
import pytest

from fqtk_tpu.core.encoding import ENCODE_LUT
from fqtk_tpu.io import native as native_io
from fqtk_tpu.ops.matcher import ExpectedSet, assign_batch_np

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library unavailable"
)


def _pack(obs: np.ndarray) -> np.ndarray:
    masks = ENCODE_LUT[obs].astype(np.uint8)
    n, length = masks.shape
    if length % 2:
        masks = np.concatenate(
            [masks, np.zeros((n, 1), dtype=np.uint8)], axis=1
        )
    return (masks[:, 0::2] | (masks[:, 1::2] << 4)).astype(np.uint8)


def _whitelist(rng, k, length, alphabet="ACGT"):
    out, seen = [], set()
    while len(out) < k:
        b = "".join(rng.choice(list(alphabet), size=length))
        if b not in seen:
            seen.add(b)
            out.append(b)
    return out


def _mutated_reads(rng, barcodes, n, length, max_mm, delta):
    weird = np.frombuffer(b"NRYacgtU.", dtype=np.uint8)
    rows = []
    for _ in range(n):
        base = list(barcodes[int(rng.integers(0, len(barcodes)))].encode())
        for _ in range(int(rng.integers(0, max_mm + delta + 2))):
            pos = int(rng.integers(0, length))
            if rng.integers(0, 3) == 0:
                base[pos] = int(weird[int(rng.integers(0, len(weird)))])
            else:
                base[pos] = ord("ACGT"[int(rng.integers(0, 4))])
        rows.append(bytes(base))
    return np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(n, length)


@pytest.mark.parametrize(
    "max_mm,delta,length,k,alphabet",
    [
        (1, 2, 17, 96, "ACGT"),     # the dual-index headline shape
        (0, 2, 17, 16, "ACGT"),     # single-end inline config (mm=0)
        (0, 2, 17, 16, "ACGTN"),    # IUPAC/N expected barcodes
        (2, 1, 8, 64, "ACGTNRY"),   # heavier ambiguity, short barcodes
        (1, 0, 9, 33, "ACGT"),      # odd length (tail-nibble masking)
        (2, 3, 40, 120, "ACGT"),    # multi-u64-block length
        (1, 2, 16, 128, "ACGT"),    # exact block boundary
    ],
)
def test_smallk_matches_numpy_spec(max_mm, delta, length, k, alphabet):
    rng = np.random.default_rng(2000 + max_mm * 10 + delta + length)
    barcodes = _whitelist(rng, k, length, alphabet)
    expected = ExpectedSet.from_barcodes(barcodes)
    m = native_io.NativeSmallKMatcher(barcodes, max_mm, delta, threads=3)

    obs = _mutated_reads(rng, barcodes, 4000, length, max_mm, delta)
    got = m.assign(_pack(obs))
    want, _, _ = assign_batch_np(obs, expected, max_mm, delta)
    want = np.where(want < 0, k, want).astype(np.int32)
    np.testing.assert_array_equal(got, want)
    m.close()


def test_smallk_memo_cache_transparent(monkeypatch):
    """The per-thread memo cache (reference parity with the AHashMap at
    barcode_matching.rs:173-182) must be invisible: repeated batches through
    one matcher, heavy duplication inside a batch (hits), and random reads
    (direct-mapped collisions/overwrites) all agree with a cache-disabled
    matcher and the NumPy spec."""
    rng = np.random.default_rng(4242)
    k, length = 96, 17
    barcodes = _whitelist(rng, k, length)
    expected = ExpectedSet.from_barcodes(barcodes)
    # mostly-duplicated reads: exact barcodes + a small mutant pool
    pool = _mutated_reads(rng, barcodes, 300, length, 1, 2)
    obs = pool[rng.integers(0, len(pool), size=8000)]
    m = native_io.NativeSmallKMatcher(barcodes, 1, 2, threads=3)
    monkeypatch.setenv("FQTK_SMALLK_NO_CACHE", "1")
    m_off = native_io.NativeSmallKMatcher(barcodes, 1, 2, threads=3)
    monkeypatch.delenv("FQTK_SMALLK_NO_CACHE")
    want, _, _ = assign_batch_np(obs, expected, 1, 2)
    want = np.where(want < 0, k, want).astype(np.int32)
    for lo in range(0, len(obs), 2048):  # several batches, warm cache
        chunk = obs[lo : lo + 2048]
        got = m.assign(_pack(chunk))
        np.testing.assert_array_equal(got, want[lo : lo + 2048])
        np.testing.assert_array_equal(got, m_off.assign(_pack(chunk)))
    m.close()
    m_off.close()


def test_smallk_tie_break_first_index():
    barcodes = ["AAAAAAAA", "AAAAAAAT", "TTTTTTTT"]
    obs = np.frombuffer(b"AAAAAAAC", dtype=np.uint8).reshape(1, 8)
    m = native_io.NativeSmallKMatcher(barcodes, 1, 0, threads=1)
    assert m.assign(_pack(obs))[0] == 0  # idx 0 and 1 at mm=1; first wins
    m.close()
    m2 = native_io.NativeSmallKMatcher(barcodes, 1, 1, threads=1)
    assert m2.assign(_pack(obs))[0] == 3  # delta gate -> unmatched
    m2.close()


def test_smallk_nocall_budget_with_n_in_whitelist():
    # max_ns_in_barcodes = 1 raises the no-call budget to max_mm + 1
    # (reference barcode_matching.rs:170-172); N-against-N positions are
    # zero-cost (15 & ~15 == 0) while N-against-ACGT positions mismatch.
    # Differential against the NumPy spec on every gate-adjacent row.
    barcodes = ["ACGTACGN", "TGCATGCA"]
    expected = ExpectedSet.from_barcodes(barcodes)
    m = native_io.NativeSmallKMatcher(barcodes, 1, 2, threads=1)
    rows = [b"NCGTACGN", b"NNGTACGN", b"ACGTACGN", b"NNGTACGT", b"NNNTACGT"]
    obs = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(len(rows), 8)
    got = m.assign(_pack(obs))
    want, _, _ = assign_batch_np(obs, expected, 1, 2)
    want = np.where(want < 0, 2, want).astype(np.int32)
    np.testing.assert_array_equal(got, want)
    # sanity anchors: one N on the whitelist's own N position still matches;
    # two no-calls spending the whole budget on ACGT positions cannot
    assert got[0] == 0 and got[3] == 2
    m.close()


def test_smallk_u_matches_t_and_lowercase():
    barcodes = ["ACGTACGT", "GGGGCCCC"]
    m = native_io.NativeSmallKMatcher(barcodes, 0, 2, threads=1)
    obs = np.frombuffer(b"acgUACGU", dtype=np.uint8).reshape(1, 8)
    assert m.assign(_pack(obs))[0] == 0
    m.close()


def test_smallk_rejects_invalid_whitelist_bytes():
    with pytest.raises(native_io.NativeDemuxError):
        native_io.NativeSmallKMatcher(["ACGX", "ACGT"], 1, 2)


def test_smallk_selected_in_driver_matches_numpy_engine(tmp_path):
    """devices=1 + tiny K routes run_demux through the small-K host matcher
    (the auto policy's escape hatch); outputs must be byte-identical to the
    numpy engine."""
    from fqtk_tpu.runtime.demux import DemuxConfig, run_demux

    rng = np.random.default_rng(7)
    barcodes = _whitelist(rng, 16, 17, "ACGTN")
    meta = tmp_path / "metadata.tsv"
    meta.write_text(
        "sample_id\tbarcode\n"
        + "".join(f"S{i:03d}\t{b}\n" for i, b in enumerate(barcodes))
    )
    i1 = tmp_path / "in.fq.gz"
    with gzip.open(i1, "wb") as fh:
        for r in range(200):
            bc = list(barcodes[int(rng.integers(0, 16))])
            if rng.integers(0, 3) == 0:
                bc[int(rng.integers(0, 17))] = "ACGTN"[int(rng.integers(0, 5))]
            fh.write(
                b"@q%d 1:N:0:0\n%sACGTAC\n+\n%s\n"
                % (r, "".join(bc).encode(), b"I" * 23)
            )

    def cfg(out, engine):
        return DemuxConfig(
            inputs=[i1],
            read_structures=["17B+T"],
            sample_metadata=meta,
            output=tmp_path / out,
            batch_size=64,
            engine=engine,
            devices=1,
        )

    res_n = run_demux(cfg("out_native", "native"))
    res_p = run_demux(cfg("out_numpy", "numpy"))
    assert res_n.total_templates == res_p.total_templates == 200
    for p in sorted((tmp_path / "out_numpy").glob("*.fq.gz")):
        a = gzip.decompress(p.read_bytes())
        b = gzip.decompress((tmp_path / "out_native" / p.name).read_bytes())
        assert a == b, p.name
    assert (tmp_path / "out_native" / "demux-metrics.txt").read_text() == (
        tmp_path / "out_numpy" / "demux-metrics.txt"
    ).read_text()


def test_matcher_device_forces_device_path(tmp_path, monkeypatch):
    """matcher='device' must bypass the host matchers (observable: the
    native module's matcher constructors are never touched)."""
    from fqtk_tpu.runtime.demux import DemuxConfig, run_demux

    def _boom(*a, **k):
        raise AssertionError("host matcher constructed under matcher=device")

    monkeypatch.setattr(native_io, "NativeSmallKMatcher", _boom)
    monkeypatch.setattr(native_io, "NativeBigKMatcher", _boom)

    barcodes = ["ACGTACGT", "TGCATGCA"]
    meta = tmp_path / "m.tsv"
    meta.write_text(
        "sample_id\tbarcode\n"
        + "".join(f"S{i}\t{b}\n" for i, b in enumerate(barcodes))
    )
    p = tmp_path / "in.fq.gz"
    with gzip.open(p, "wb") as fh:
        for i in range(20):
            fh.write(b"@q%d\n%sAC\n+\nIIIIIIIIII\n" % (i, barcodes[i % 2].encode()))
    res = run_demux(
        DemuxConfig(
            inputs=[p],
            read_structures=["8B+T"],
            sample_metadata=meta,
            output=tmp_path / "out",
            batch_size=16,
            engine="native",
            devices=1,
            matcher="device",
        )
    )
    assert res.total_templates == 20
