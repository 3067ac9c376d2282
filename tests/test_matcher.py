"""Barcode matcher tests mirroring ``/root/reference/src/lib/barcode_matching.rs:189-448``
and ``bitenc.rs`` hamming semantics, plus NumPy-vs-JAX equivalence."""

import numpy as np
import pytest

from fqtk_tpu.ops.matcher import (
    UNMATCHED,
    ExpectedSet,
    assign_batch_np,
    mismatch_counts_np,
)


def count_mismatches(observed: str, expected: str) -> int:
    es = ExpectedSet.from_barcodes([expected])
    obs = np.frombuffer(observed.encode(), dtype=np.uint8)[None, :]
    return int(mismatch_counts_np(obs, es)[0, 0])


def assign_one(barcodes, read, max_mm, delta):
    es = ExpectedSet.from_barcodes(list(barcodes))
    obs = np.frombuffer(read.encode(), dtype=np.uint8)[None, :]
    idx, best, nxt = assign_batch_np(obs, es, max_mm, delta)
    return int(idx[0]), int(best[0]), int(nxt[0])


# ---------------------------------------------------------------------------
# count_mismatches semantics (barcode_matching.rs:245-320)
# ---------------------------------------------------------------------------


def test_find_no_mismatches():
    assert count_mismatches("GATTACA", "GATTACA") == 0


def test_ns_in_expected_barcode_dont_contribute():
    assert count_mismatches("GATTACA", "GANNACA") == 0


def test_all_ns_barcode_have_no_mismatches():
    assert count_mismatches("GANNACA", "NNNNNNN") == 0


def test_find_two_mismatches():
    assert count_mismatches("GATTACA", "GACCACA") == 2


def test_all_mismatches():
    assert count_mismatches("GATTACA", "CTAATGT") == 7


def test_iupac_barcode_containment():
    assert count_mismatches("ACGTTAAACCGAAACA", "ACGTUMRWSYKVHDBN") == 0
    # IUPAC bases in the observed barcode are mismatches vs concrete expected
    assert count_mismatches("ACGTUMRWSYKVHDBN", "ACGTTAAACCGAAACA") == 11


def test_iupac_asymmetry():
    assert count_mismatches("N", "R") == 1
    assert count_mismatches("N", "N") == 0
    assert count_mismatches("R", "R") == 0
    assert count_mismatches("R", "V") == 0
    assert count_mismatches("R", "D") == 0
    assert count_mismatches("R", "N") == 0
    assert count_mismatches("R", "B") == 1


# ---------------------------------------------------------------------------
# assign semantics (barcode_matching.rs:322-448)
# ---------------------------------------------------------------------------


def test_assign_exact_match():
    idx, best, nxt = assign_one(["ACGT", "AAAG", "CACA"], "ACGT", 2, 2)
    assert (idx, best, nxt) == (0, 0, 3)


def test_assign_imprecise_match():
    idx, best, nxt = assign_one(["AAAT", "AGAG", "CACA"], "GAAT", 2, 2)
    assert (idx, best, nxt) == (0, 1, 3)


def test_assign_precise_match_with_no_call():
    idx, best, nxt = assign_one(["AAAT", "AGAG", "CACA"], "NAAT", 2, 2)
    assert (idx, best, nxt) == (0, 1, 3)


def test_assign_imprecise_match_with_no_call():
    idx, best, nxt = assign_one(["AAATTT", "AGAGGG", "CACAGG"], "NAGTTT", 2, 2)
    assert (idx, best, nxt) == (0, 2, 5)


def test_sample_no_call_doesnt_contribute():
    idx, best, nxt = assign_one(["NAGTTT", "AGAGGG", "CACAGG"], "AAATTT", 1, 2)
    assert (idx, best, nxt) == (0, 1, 4)


def test_read_no_call_contributes():
    idx, _, _ = assign_one(["AAATTT", "AGAGGG", "CACAGG"], "NAGTTT", 1, 2)
    assert idx == UNMATCHED


def test_no_match_if_too_many_mismatches():
    idx, _, _ = assign_one(
        ["AAGCTAG", "CAGCTAG", "GAGCTAG", "TAGCTAG"], "ATCGATC", 0, 100
    )
    assert idx == UNMATCHED


def test_no_match_if_within_mismatch_delta():
    idx, _, _ = assign_one(
        ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "GGGGGGTT"], "GGGGGGTT", 100, 3
    )
    assert idx == UNMATCHED


def test_no_match_if_too_many_nocalls():
    idx, _, _ = assign_one(
        ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "GGGGGGTT"], "GGGGGGTN", 0, 100
    )
    assert idx == UNMATCHED


def test_single_sample_next_best_is_255():
    idx, best, nxt = assign_one(["GATTGGG"], "GATTGGG", 1, 2)
    assert (idx, best, nxt) == (0, 0, 255)


def test_first_index_wins_ties():
    # two equidistant barcodes: delta gate rejects, but best index must be
    # the first one (reference scans in order with strict '<')
    es = ExpectedSet.from_barcodes(["AAAA", "AAAT"])
    obs = np.frombuffer(b"AAAC", dtype=np.uint8)[None, :]
    idx, best, nxt = assign_batch_np(obs, es, 2, 0)
    assert best[0] == 1 and nxt[0] == 1
    assert idx[0] == 0  # delta=0: accepted, first index


def test_empty_samples_raises():
    with pytest.raises(ValueError, match="at least one sample"):
        ExpectedSet.from_barcodes([])


def test_empty_barcode_raises():
    with pytest.raises(ValueError, match="cannot be empty"):
        ExpectedSet.from_barcodes([""])


# ---------------------------------------------------------------------------
# JAX path equivalence
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k_chunk", [4, 16384])
def test_jax_matches_numpy_random(k_chunk):
    from fqtk_tpu.ops.matcher import make_assign_fn

    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    k, length, b = 37, 12, 257
    barcodes = set()
    while len(barcodes) < k:
        barcodes.add(bytes(rng.choice(bases, size=length)).decode())
    barcodes = sorted(barcodes)
    es = ExpectedSet.from_barcodes(barcodes)
    obs = rng.choice(bases, size=(b, length)).astype(np.uint8)
    # make some reads exact matches
    for i in range(0, b, 5):
        obs[i] = np.frombuffer(barcodes[i % k].encode(), dtype=np.uint8)

    for max_mm, delta in [(0, 0), (1, 2), (2, 1), (100, 3)]:
        np_idx, np_best, np_next = assign_batch_np(obs, es, max_mm, delta)
        fn = make_assign_fn(es, max_mm, delta, k_chunk=k_chunk)
        j_idx, j_best, j_next = (np.asarray(x) for x in fn(obs))
        expect_idx = np.where(np_idx < 0, es.count, np_idx)
        np.testing.assert_array_equal(j_idx, expect_idx, err_msg=f"mm={max_mm} d={delta}")
        np.testing.assert_array_equal(j_best, np_best)
        np.testing.assert_array_equal(j_next, np_next)


def test_jax_iupac_and_nocall_gates():
    from fqtk_tpu.ops.matcher import make_assign_fn

    barcodes = ["NNAAAAA", "NNCCCCC"]
    es = ExpectedSet.from_barcodes(barcodes)
    reads = [b"ANAAAAA", b"ANCCCCC", b"NNNAAAA"]
    obs = np.stack([np.frombuffer(r, dtype=np.uint8) for r in reads])
    fn = make_assign_fn(es, 0, 0)
    idx, _, _ = (np.asarray(x) for x in fn(obs))
    assert list(idx) == [0, 1, 2]  # third read: 3 no-calls > 0 + 2 -> unmatched


def test_jax_packed_masks_and_compact_output():
    from fqtk_tpu.core.encoding import ENCODE_LUT
    from fqtk_tpu.ops.matcher import make_assign_fn

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    barcodes = sorted(
        {bytes(rng.choice(bases, size=9)).decode() for _ in range(60)}
    )
    es = ExpectedSet.from_barcodes(barcodes)
    obs = rng.choice(bases, size=(128, 9)).astype(np.uint8)
    obs[::3] = np.frombuffer(barcodes[0].encode(), dtype=np.uint8)

    # pack: two 4-bit masks per byte, low nibble = even position
    masks = ENCODE_LUT[obs]
    padded = np.zeros((128, 10), dtype=np.uint8)
    padded[:, :9] = masks
    packed = (padded[:, 0::2] | (padded[:, 1::2] << 4)).astype(np.uint8)

    np_idx, np_best, np_next = assign_batch_np(obs, es, 1, 2)
    expect = np.where(np_idx < 0, es.count, np_idx)
    fn = make_assign_fn(es, 1, 2, packed_masks=True, compact_output=True)
    j_idx, j_best, j_next = (np.asarray(x) for x in fn(packed))
    assert j_idx.dtype == np.uint8
    np.testing.assert_array_equal(j_idx.astype(np.int32), expect)
    np.testing.assert_array_equal(j_best, np_best)
    np.testing.assert_array_equal(j_next, np_next)


def test_jax_packed2_matches_numpy_random():
    """The 2-bit-packed path (quarter-width transfers, 4-wide one-hot) must
    agree with the NumPy spec on pure-ACGT reads — including whitelists that
    themselves contain IUPAC/N codes (compat4 carries the containment
    semantics; only the OBSERVED side is restricted to ACGT)."""
    from fqtk_tpu.ops.matcher import make_assign_fn

    rng = np.random.default_rng(17)
    length, k, b = 13, 37, 512
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    barcodes = []
    seen = set()
    while len(barcodes) < k:
        bc = bytes(rng.choice(bases, size=length))
        if bc not in seen:
            seen.add(bc)
            barcodes.append(bc.decode())
    # sprinkle IUPAC into some EXPECTED barcodes
    barcodes[3] = "N" + barcodes[3][1:]
    barcodes[11] = barcodes[11][:5] + "R" + barcodes[11][6:]
    es = ExpectedSet.from_barcodes(barcodes)

    obs = rng.choice(bases, size=(b, length)).astype(np.uint8)
    for i in range(0, b, 3):  # majority near-matches to exercise the gates
        row = np.frombuffer(barcodes[i % k].replace("N", "A").replace("R", "G").encode(), dtype=np.uint8).copy()
        if i % 2:
            row[rng.integers(0, length)] = bases[rng.integers(0, 4)]
        obs[i] = row

    # pack 2-bit codes (A0 C1 G2 T3), 4 per byte, low pair first
    code = np.zeros_like(obs)
    for v, c in zip(b"ACGT", range(4)):
        code[obs == v] = c
    stride = (length + 3) // 4
    packed = np.zeros((b, stride), dtype=np.uint8)
    for j in range(length):
        packed[:, j >> 2] |= (code[:, j] << (2 * (j & 3))).astype(np.uint8)

    for max_mm, delta in [(1, 2), (0, 0), (2, 1)]:
        fn = make_assign_fn(es, max_mm, delta, packed2=True, compact_output=True)
        got = np.asarray(fn(packed)[0]).astype(np.int32)
        want, _, _ = assign_batch_np(obs, es, max_mm, delta)
        want = np.where(want < 0, k, want).astype(np.int32)
        np.testing.assert_array_equal(got, want)
