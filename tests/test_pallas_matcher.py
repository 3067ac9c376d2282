"""Pallas fused-matcher kernel tests (interpret mode on CPU; the compiled
path is exercised on real TPU by bench.py and the verify flow)."""

import numpy as np
import pytest

from fqtk_tpu.ops.matcher import ExpectedSet, assign_batch_np

jax = pytest.importorskip("jax")

from fqtk_tpu.ops.pallas_matcher import make_pallas_assign_fn  # noqa: E402


def _case(rng, k, length, b):
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    barcodes = set()
    while len(barcodes) < k:
        barcodes.add(bytes(rng.choice(bases, size=length)).decode())
    barcodes = sorted(barcodes)
    es = ExpectedSet.from_barcodes(barcodes)
    obs = rng.choice(bases, size=(b, length)).astype(np.uint8)
    for i in range(0, b, 4):
        obs[i] = np.frombuffer(barcodes[i % k].encode(), dtype=np.uint8)
    return es, obs


@pytest.mark.parametrize("mxu_dtype", ["int8", "bf16"])
@pytest.mark.parametrize("tile_b,tile_k", [(256, 128), (512, 256)])
@pytest.mark.parametrize("mm,delta", [(1, 2), (0, 0), (2, 1)])
def test_pallas_matches_numpy(tile_b, tile_k, mm, delta, mxu_dtype):
    rng = np.random.default_rng(7)
    es, obs = _case(rng, k=43, length=11, b=512)
    fn = make_pallas_assign_fn(
        es, mm, delta, tile_b=tile_b, tile_k=tile_k, interpret=True,
        mxu_dtype=mxu_dtype,
    )
    idx, best, nxt = (np.asarray(x) for x in fn(obs))
    np_idx, np_best, np_next = assign_batch_np(obs, es, mm, delta)
    expect = np.where(np_idx < 0, es.count, np_idx)
    np.testing.assert_array_equal(idx, expect)
    np.testing.assert_array_equal(best, np_best)
    np.testing.assert_array_equal(nxt, np_next)


def test_pallas_multiple_k_tiles_tie_break():
    """Equidistant barcodes split across K tiles: first index must win."""
    barcodes = [
        "AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "TTTTTTTT",
        "AAAAAAAT", "CCCCCCCG", "GGGGGGGA", "TTTTTTTC",
    ]
    es = ExpectedSet.from_barcodes(barcodes)
    obs = np.frombuffer(b"AAAAAATT", dtype=np.uint8)[None, :].repeat(256, 0)
    # best is barcode 4 (1 mm), runner-up barcode 0 (2 mm); the numpy spec
    # is authoritative for the merged result either way
    fn = make_pallas_assign_fn(es, 8, 0, tile_b=256, tile_k=128, interpret=True)
    idx, best, nxt = (np.asarray(x) for x in fn(obs))
    np_idx, np_best, np_next = assign_batch_np(obs, es, 8, 0)
    np.testing.assert_array_equal(idx, np.where(np_idx < 0, es.count, np_idx))
    np.testing.assert_array_equal(best, np_best)
    np.testing.assert_array_equal(nxt, np_next)


def test_pallas_iupac_and_nocall_gates():
    es = ExpectedSet.from_barcodes(["NNAAAAAA", "NNCCCCCC"])
    reads = [b"ANAAAAAA", b"ANCCCCCC", b"NNNAAAAA", b"anaaaaaa"]
    obs = np.stack([np.frombuffer(r, dtype=np.uint8) for r in reads])
    obs = np.tile(obs, (64, 1))  # pad to tile_b
    fn = make_pallas_assign_fn(es, 0, 0, tile_b=256, tile_k=128, interpret=True)
    idx, _, _ = (np.asarray(x) for x in fn(obs))
    assert list(idx[:4]) == [0, 1, 2, 0]  # lowercase read matches too


def test_pallas_single_barcode_next_is_maxcount():
    """k == 1: next must be MAX_COUNT (numpy spec) even though the unmasked
    pad columns report count L inside the kernel."""
    from fqtk_tpu.ops.matcher import MAX_COUNT

    es = ExpectedSet.from_barcodes(["ACGTACGT"])
    obs = np.frombuffer(b"ACGTACGTACGTACGAACGTTCGT", dtype=np.uint8).reshape(3, 8)
    obs = np.tile(obs, (86, 1))[:256]
    fn = make_pallas_assign_fn(es, 1, 4, tile_b=256, tile_k=128, interpret=True)
    idx, best, nxt = (np.asarray(x) for x in fn(obs))
    np_idx, np_best, np_next = assign_batch_np(obs, es, 1, 4)
    assert (nxt == MAX_COUNT).all()
    np.testing.assert_array_equal(idx, np.where(np_idx < 0, es.count, np_idx))
    np.testing.assert_array_equal(best, np_best)
    np.testing.assert_array_equal(nxt, np_next)


@pytest.mark.parametrize("mxu_dtype", ["int8", "bf16"])
def test_pallas_packed2_matches_numpy(mxu_dtype):
    """bit2-packed pure-ACGT input, incl. an IUPAC whitelist: the 4-class
    contraction must agree with the numpy spec (no-call gate is host-side
    for this packing, so only pure reads are driven)."""
    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    barcodes = set()
    while len(barcodes) < 37:
        barcodes.add(bytes(rng.choice(bases, size=9)).decode())
    barcodes = sorted(barcodes)
    barcodes[3] = barcodes[3][:4] + "N" + barcodes[3][5:]  # IUPAC whitelist ok
    barcodes[7] = "R" + barcodes[7][1:]
    es = ExpectedSet.from_barcodes(barcodes)
    obs = rng.choice(bases, size=(300, 9)).astype(np.uint8)
    for i in range(0, 300, 3):
        bc = barcodes[i % 37].replace("N", "G").replace("R", "A")
        obs[i] = np.frombuffer(bc.encode(), dtype=np.uint8)

    code = np.full(256, 0, dtype=np.uint8)
    for c, b in zip((0, 1, 2, 3), b"ACGT"):
        code[b] = c
    codes = code[obs]
    padded = np.zeros((300, 12), dtype=np.uint8)
    padded[:, :9] = codes
    packed = (
        padded[:, 0::4] | (padded[:, 1::4] << 2) | (padded[:, 2::4] << 4)
        | (padded[:, 3::4] << 6)
    ).astype(np.uint8)

    np_idx, np_best, np_next = assign_batch_np(obs, es, 1, 2)
    expect = np.where(np_idx < 0, es.count, np_idx)
    fn = make_pallas_assign_fn(
        es, 1, 2, tile_b=256, tile_k=128, interpret=True, packed2=True,
        compact_output=True, mxu_dtype=mxu_dtype,
    )
    j_idx, j_best, j_next = (np.asarray(x) for x in fn(packed))
    assert j_idx.dtype == np.uint8
    np.testing.assert_array_equal(j_idx.astype(np.int32), expect)
    np.testing.assert_array_equal(j_best, np_best)
    np.testing.assert_array_equal(j_next, np_next)


@pytest.mark.parametrize("colmerge,unroll", [(False, 1), (True, 1), (True, 2), (True, 3)])
def test_pallas_top2_schemes_agree(colmerge, unroll):
    """Both top-2 reductions (per-step lane-reduce and column-merge, incl.
    unrolled column-merge with a partial last step) must reproduce the
    numpy spec — with duplicated barcodes forcing cross-tile count ties,
    where the first global index must win."""
    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = rng.choice(bases, size=(300, 12)).astype(np.uint8)
    seqs[150] = seqs[3]  # same barcode in tiles 1 and 2 -> best-count tie
    seqs[299] = seqs[0]
    barcodes = [bytes(r).decode() for r in seqs]
    es = ExpectedSet.from_barcodes(barcodes)
    obs = rng.choice(bases, size=(600, 12)).astype(np.uint8)
    obs[:300] = seqs
    np_idx, np_best, np_next = assign_batch_np(obs, es, 2, 1)
    expect = np.where(np_idx < 0, es.count, np_idx)
    fn = make_pallas_assign_fn(
        es, 2, 1, tile_b=256, tile_k=128, interpret=True,
        _top2_colmerge=colmerge, _colmerge_unroll=unroll,
    )
    idx, best, nxt = (np.asarray(x) for x in fn(obs))
    np.testing.assert_array_equal(idx, expect)
    np.testing.assert_array_equal(best, np_best)
    np.testing.assert_array_equal(nxt, np_next)


def test_pallas_packed_masks_and_compact_output():
    from fqtk_tpu.core.encoding import ENCODE_LUT

    rng = np.random.default_rng(3)
    es, obs = _case(rng, k=29, length=9, b=300)  # odd length + non-tile b
    masks = ENCODE_LUT[obs]
    padded = np.zeros((300, 10), dtype=np.uint8)
    padded[:, :9] = masks
    packed = (padded[:, 0::2] | (padded[:, 1::2] << 4)).astype(np.uint8)

    np_idx, np_best, np_next = assign_batch_np(obs, es, 1, 2)
    expect = np.where(np_idx < 0, es.count, np_idx)
    fn = make_pallas_assign_fn(
        es, 1, 2, tile_b=256, tile_k=128, interpret=True,
        packed_masks=True, compact_output=True,
    )
    j_idx, j_best, j_next = (np.asarray(x) for x in fn(packed))
    assert j_idx.dtype == np.uint8
    np.testing.assert_array_equal(j_idx.astype(np.int32), expect)
    np.testing.assert_array_equal(j_best, np_best)
    np.testing.assert_array_equal(j_next, np_next)
