"""Pallas TPU kernel for fused barcode matching.

The XLA path (:func:`fqtk_tpu.ops.matcher.make_assign_fn`) materializes the
one-hot expansion ``obs16[B, L*16]`` and per-chunk count matrices in HBM.
This kernel fuses the whole pipeline per tile in VMEM:

    obs codes/masks [TB, L]  --repeat+compare-->  one-hot [TB, W*L] (VMEM)
    one-hot @ compat tile [W*L, TK]  (MXU; int8 x int8 -> int32 by default —
                                      2x the bf16 MXU rate on v5e/v6 — or
                                      bf16 x bf16 -> f32, both exact since
                                      counts <= 255)
    top-2 reduction, one of two schemes (VPU):
      * column-merge (int8 default): per lane column, running elementwise
        (smallest, second-smallest) (count, tile-id) keys across K tiles —
        3 VPU ops and NO cross-lane reduction per step; one masked lane
        top-2 over (count, tile, column) keys at the last K tile.  The
        count*ck key scale rides the matmul (scaled one-hot x scaled
        compat), so the per-step key build is a single scalar add.
        Measured 1.7x the per-step scheme at K=737K (cross-lane mins were
        the VPU wall, not elementwise passes).
      * per-step lane-reduce (bf16 / fallback): combined count*TK+col key,
        two lane mins per K tile, running (best, idx, next) merge.

``W`` is the one-hot width: 16 for 4-bit IUPAC mask input (``nib4``), 4 for
2-bit pure-ACGT codes (``packed2`` — quarter-width transfers AND a 4x
narrower contraction; ambiguous reads are flagged by the native engine and
resolved host-side, exactly as the XLA packed2 path).

HBM traffic per batch: obs once + compat once per B tile + 3 output vectors
— no [B, K] intermediate, which is what makes 737K-barcode whitelists
feasible at full speed.

Grid: ``(nB, nK)`` with K minormost; the scratch accumulator carries across
the K tiles of one B tile (standard accumulator pattern).  Tie-breaks match
the reference scan (first index wins, ``barcode_matching.rs:132``) because
the combined key picks the first minimum within a tile and the cross-tile
merge prefers the earlier tile on ties.

The kernel is factored into three pieces so the multi-device K-sharded path
(:mod:`fqtk_tpu.parallel.mesh`) can run the SAME kernel per whitelist shard
inside ``shard_map``:

- :func:`plan_local_kernel` — static tiling/scheme decisions for a local
  column count ``k``;
- :func:`compat_for_plan` — class-major (scaled, padded) mismatch table for
  a mask array, built per shard so the full [L*16, K] table never
  materializes;
- :func:`make_kernel_runner` — ``(vals_t[L, B] int32, compat) -> (best,
  idx, next)`` over the local columns (pad columns score exactly L and can
  never win while a real column exists; see the in-kernel comments).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from .matcher import MAX_COUNT, ExpectedSet

logger = logging.getLogger(__name__)


def _compat_classmajor(
    masks: np.ndarray, k_padded: int, onehot_width: int
) -> np.ndarray:
    """Mismatch-indicator table in *class-major* row layout ``c*L + l``.

    ``pltpu.repeat(masks, W, axis=1)`` tiles the whole [TB, L] block W
    times, so kernel column ``j`` corresponds to position ``l = j % L`` and
    class ``c = j // L`` — the row order here must match.  Classes are the
    16 possible 4-bit masks (nib4 input) or the 4 pure base codes mapped to
    their masks 1/2/4/8 (packed2 input).  ``masks`` is ``[K, L] uint8``
    (``ExpectedSet.masks`` or a K-shard slice of it).
    """
    k, length = masks.shape
    if onehot_width == 4:
        c = np.array([1, 2, 4, 8], dtype=np.uint8)  # masks of codes 0..3
    else:
        c = np.arange(16, dtype=np.uint8)
    # viol[c, l, k] = 1 iff mask value c has a bit outside expected (k, l)
    viol = (c[:, None, None] & ~masks.T[None, :, :]) & 0xF
    compat = (viol != 0).astype(np.int8).reshape(onehot_width * length, k)
    if k_padded != k:
        pad = np.ones((compat.shape[0], k_padded - k), dtype=np.int8)
        compat = np.concatenate([compat, pad], axis=1)
    return compat


@dataclass(frozen=True)
class KernelPlan:
    """Static decisions for one kernel instantiation over ``k`` columns."""

    k: int
    length: int
    onehot_width: int
    wl: int
    tile_b: int
    tile_k: int
    n_k_tiles: int
    k_padded: int
    colmerge: bool
    mxu_scaled: bool
    key_s1: int
    key_s2: int
    ck: int
    ck_s1: int
    ck_s2: int
    unroll: int
    n_steps: int
    int8_mxu: bool
    interpret: bool

    @property
    def compat_scale(self) -> int:
        """Factor baked into the compat table (rides the matmul)."""
        if self.mxu_scaled:
            return self.key_s2
        if self.colmerge:
            return self.ck_s2
        return 1

    @property
    def macs_per_row(self) -> int:
        return self.k_padded * self.wl


def plan_local_kernel(
    k: int,
    length: int,
    tile_b: int = 512,
    tile_k: int = 512,
    interpret: bool = False,
    packed2: bool = False,
    mxu_dtype: str = "int8",
    _fuse_key_scale: bool = True,
    _top2_colmerge: bool = True,
    _colmerge_unroll: int = 1,
) -> KernelPlan:
    """Choose tiling and reduction scheme for ``k`` local columns."""
    if mxu_dtype not in ("int8", "bf16"):
        raise ValueError(f"mxu_dtype must be int8 or bf16, got {mxu_dtype}")
    if length > 255:
        raise ValueError(
            "pallas matcher supports barcode lengths <= 255 (combined-key "
            "exactness bound); use the XLA engine for longer barcodes"
        )
    onehot_width = 4 if packed2 else 16
    wl = length * onehot_width
    tile_k = min(tile_k, max(128, 1 << (k - 1).bit_length()))
    n_k_tiles = -(-k // tile_k)
    k_padded = n_k_tiles * tile_k

    int8_mxu = mxu_dtype == "int8"

    # MXU-fused key scaling (int8 mode): the combined key needs
    # ``counts * tile_k`` — a full [TB, TK] VPU multiply per grid step.
    # Setting the one-hot's nonzero to s1 and the compat indicator to s2
    # with s1 * s2 == tile_k makes every mismatch contribute exactly
    # tile_k *inside the matmul*, so the kernel reads the pre-scaled key
    # base straight out of the MXU and only adds the column iota.  Exact:
    # max accumulator = L * tile_k <= 255 * 8128 < 2^31.  Valid whenever
    # tile_k (always a power of two here) splits into int8-range factors.
    key_s1 = 1 << ((tile_k.bit_length() - 1 + 1) // 2)
    key_s2 = tile_k // key_s1
    # Column-merge top-2: instead of two cross-lane min reductions per K
    # step, keep elementwise running (smallest, second-smallest) keys per
    # lane column across the K tiles and lane-reduce ONCE per B tile.  The
    # per-column key only needs (count, tile-id) — the column is the lane
    # position, recovered at the end — and ``count * ck`` comes pre-scaled
    # out of the matmul (one-hot cs1, compat cs2, cs1 * cs2 == ck), so a K
    # step costs ONE scalar add plus the 3-op two-smallest merge, with no
    # reductions.  The final lane-wise top-2 extends keys to
    # (count, tile, column) lexicographic order — exactly the reference's
    # first-global-index tie-break.  Exactness: the extended key's maximum
    # (MAX_COUNT+1) * ck * tile_k must stay an int32.
    ck = 1 << max(1, (n_k_tiles - 1).bit_length())  # tile-id capacity
    ck_s1 = 1 << ((ck.bit_length() - 1 + 1) // 2)
    ck_s2 = ck // ck_s1
    colmerge = (
        _top2_colmerge
        and int8_mxu
        and tile_k & (tile_k - 1) == 0
        and ck_s1 <= 127
        and ck_s2 <= 127
        and (MAX_COUNT + 2) * ck * tile_k < (1 << 31)
    )
    mxu_scaled = (
        _fuse_key_scale and int8_mxu
        and key_s1 <= 127 and key_s2 <= 127
        # key_s1 * key_s2 must equal tile_k exactly or count/column key
        # ranges overlap (only guaranteed for power-of-two tile_k)
        and key_s1 * key_s2 == tile_k
        and not colmerge
    )
    unroll_eff = _colmerge_unroll
    if colmerge and unroll_eff > 1 and n_k_tiles % unroll_eff:
        # pad the whitelist out to a whole number of unrolled steps (pad
        # tiles behave exactly like pad columns: count == L, largest ids).
        # Feasibility is rechecked BEFORE committing: the padding can
        # double ck past the int8/int32 key bounds, and in that case we
        # keep the (already feasible) unroll=1 colmerge kernel instead of
        # padding and falling into the slower per-step scheme.
        extra = unroll_eff - n_k_tiles % unroll_eff
        nkt2 = n_k_tiles + extra
        ck2 = 1 << max(1, (nkt2 - 1).bit_length())
        ck2_s1 = 1 << ((ck2.bit_length() - 1 + 1) // 2)
        ck2_s2 = ck2 // ck2_s1
        if (
            ck2_s1 <= 127 and ck2_s2 <= 127
            and (MAX_COUNT + 2) * ck2 * tile_k < (1 << 31)
        ):
            n_k_tiles = nkt2
            k_padded = n_k_tiles * tile_k
            ck, ck_s1, ck_s2 = ck2, ck2_s1, ck2_s2
        else:
            logger.info(
                "colmerge unroll %d would push the tile-id key past int8/"
                "int32 bounds at %d K tiles; keeping unroll=1",
                unroll_eff,
                nkt2,
            )
            unroll_eff = 1
    unroll = unroll_eff if colmerge else 1
    n_steps = -(-n_k_tiles // unroll)
    return KernelPlan(
        k=k,
        length=length,
        onehot_width=onehot_width,
        wl=wl,
        tile_b=tile_b,
        tile_k=tile_k,
        n_k_tiles=n_k_tiles,
        k_padded=k_padded,
        colmerge=colmerge,
        mxu_scaled=mxu_scaled,
        key_s1=key_s1,
        key_s2=key_s2,
        ck=ck,
        ck_s1=ck_s1,
        ck_s2=ck_s2,
        unroll=unroll,
        n_steps=n_steps,
        int8_mxu=int8_mxu,
        interpret=interpret,
    )


def compat_for_plan(masks: np.ndarray, plan: KernelPlan) -> np.ndarray:
    """Class-major compat table for ``masks`` [K, L], padded + scaled."""
    compat = _compat_classmajor(masks, plan.k_padded, plan.onehot_width)
    if plan.compat_scale != 1:
        compat = compat * np.int8(plan.compat_scale)
    return compat


def make_kernel_runner(plan: KernelPlan):
    """Build ``run(vals_t[L, B] int32, compat_dev) -> (best, idx, next)``.

    ``vals_t`` is the TRANSPOSED observed class-value matrix (mask values
    0..15 for nib4, codes 0..3 for packed2); B must be a multiple of
    ``plan.tile_b``.  ``compat_dev`` is :func:`compat_for_plan`'s output on
    device (dtype int8 or bfloat16 to match the plan).  Pure function of the
    local columns — used directly by the single-device path and per shard
    under ``shard_map`` by the K-sharded mesh path.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile_b, tile_k = plan.tile_b, plan.tile_k
    length, wl, onehot_width = plan.length, plan.wl, plan.onehot_width
    n_k_tiles, k_padded = plan.n_k_tiles, plan.k_padded
    colmerge, mxu_scaled = plan.colmerge, plan.mxu_scaled
    key_s1, ck, ck_s1 = plan.key_s1, plan.ck, plan.ck_s1
    unroll, n_steps = plan.unroll, plan.n_steps
    in_dtype = jnp.int8 if plan.int8_mxu else jnp.bfloat16
    acc_dtype = jnp.int32 if plan.int8_mxu else jnp.float32
    int8_mxu = plan.int8_mxu
    st = tile_k.bit_length() - 1  # log2(tile_k)
    sk = ck.bit_length() - 1  # log2(ck)

    def kernel(obs_ref, cls_ref, compat_ref, out_ref, acc):
        # Layout discipline: every per-read value stays a [TB, 1] column
        # (rows on sublanes) — 1-D vectors would force lane<->sublane
        # relayouts on every grid step, which measured ~25us/step.
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _init():
            colid = jax.lax.broadcasted_iota(jnp.int32, (tile_b, 8), 1)
            acc[:] = jnp.where(
                colid == 1, k_padded, jnp.where(colid < 3, MAX_COUNT, 0)
            )

        masks_t = obs_ref[:]  # [L, TB] int32 (mask/code values, transposed)
        # The observed batch comes in TRANSPOSED ([L, B]) so each DMA row is
        # tile_b contiguous bytes — with [B, L] rows of ~17 elements the DMA
        # spends ~50ns/row of descriptor overhead, which dominated runtime.
        # One-hot over the W class values; pltpu.repeat tiles the block, so
        # row j maps to (l = j % L, c = j // L) — class-major layout,
        # matching _compat_classmajor's row order.  The per-row class
        # constant comes in as an input (cls_ref): no per-step division.
        rep = pltpu.repeat(masks_t, repeats=onehot_width, axis=0)
        if mxu_scaled:
            # nonzero = key_s1, paired with the key_s2-scaled compat table:
            # the matmul emits counts * tile_k directly (see above).  The
            # select runs over the small [W*L, TB] block, not [TB, TK].
            onehot = jnp.where(rep == cls_ref[:], key_s1, 0).astype(in_dtype)
        else:
            onehot = (rep == cls_ref[:]).astype(in_dtype)

        counts = jax.lax.dot_general(
            onehot,
            compat_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )  # [TB, TK], exact integers <= L <= 255 (x tile_k when mxu_scaled)

        # combined-key top-2: key = count * TK + col packs (count, index)
        # so a single min yields both with the first-occurrence tie-break;
        # key uniqueness (distinct col) lets the second-best mask compare
        # keys.  int32 keys are exact outright; f32 keys are exact because
        # 255 * TK + TK - 1 < 2^23 for TK <= 2^15.
        # K-padding columns need NO masking: their compat column is all-ones
        # so their count is exactly L, the maximum any column can reach, and
        # they sit at the highest col values of the last tile — the combined
        # key's first-occurrence tie-break means a pad column can only win
        # against a real column with count > L, which cannot exist.  (And
        # `next` is unaffected: true next <= L always.)  Skipping the mask
        # drops two full [TB, TK] VPU passes per grid step.
        if int8_mxu:
            lcol = jax.lax.broadcasted_iota(jnp.int32, (tile_b, tile_k), 1)
            big = MAX_COUNT * tile_k
            key = counts + lcol if mxu_scaled else counts * tile_k + lcol
            m1 = jnp.min(key, axis=1, keepdims=True)  # [TB, 1]
            m2 = jnp.min(jnp.where(key == m1, big, key), axis=1, keepdims=True)
            cb = m1 // tile_k
            tile_best = jnp.minimum(cb, MAX_COUNT)
            tile_idx = m1 - cb * tile_k + kb * tile_k
            tile_next = jnp.minimum(m2 // tile_k, MAX_COUNT)
        else:
            lcolf = jax.lax.broadcasted_iota(
                jnp.int32, (tile_b, tile_k), 1
            ).astype(jnp.float32)
            tkf = float(tile_k)
            big = float(MAX_COUNT) * tkf
            key = counts * tkf + lcolf
            m1 = jnp.min(key, axis=1, keepdims=True)  # [TB, 1]
            m2 = jnp.min(jnp.where(key == m1, big, key), axis=1, keepdims=True)
            cbf = jnp.floor(m1 / tkf)
            tile_best = jnp.minimum(cbf, float(MAX_COUNT)).astype(jnp.int32)
            tile_idx = (m1 - cbf * tkf).astype(jnp.int32) + kb * tile_k
            tile_next = jnp.minimum(
                jnp.floor(m2 / tkf), float(MAX_COUNT)
            ).astype(jnp.int32)

        # ordered merge with the running (best, idx, next)
        a_best, a_idx, a_next = acc[:, 0:1], acc[:, 1:2], acc[:, 2:3]
        take_b = tile_best < a_best
        acc[:, 0:1] = jnp.where(take_b, tile_best, a_best)
        acc[:, 1:2] = jnp.where(take_b, tile_idx, a_idx)
        acc[:, 2:3] = jnp.where(
            take_b, jnp.minimum(a_best, tile_next), jnp.minimum(a_next, tile_best)
        )

        @pl.when(kb == n_k_tiles - 1)
        def _emit():
            out_ref[0, :, :] = acc[:]

    def kernel_colmerge(obs_ref, cls_ref, compat_ref, out_ref, m1s, m2s):
        # Reduction-free K steps: per (read, lane-column) keep the two
        # smallest (count, tile-id) keys seen across K tiles, then one
        # masked lane-wise top-2 over (count, tile, column) at the last
        # K tile.  The matmul emits count * ck directly (scaled one-hot
        # and compat), so the key build is a single scalar add.  With
        # ``unroll`` > 1, several K tiles merge into the accumulators per
        # grid step (pre-sorted pairwise), cutting accumulator VMEM
        # traffic by the unroll factor.
        kb = pl.program_id(1)
        init = jnp.int32((MAX_COUNT + 1) << sk)

        @pl.when(kb == 0)
        def _init():
            m1s[:] = jnp.full((tile_b, tile_k), init, jnp.int32)
            m2s[:] = jnp.full((tile_b, tile_k), init, jnp.int32)

        masks_t = obs_ref[:]
        rep = pltpu.repeat(masks_t, repeats=onehot_width, axis=0)
        onehot = jnp.where(rep == cls_ref[:], ck_s1, 0).astype(in_dtype)
        lo = hi = None
        for u in range(unroll):
            counts_ck = jax.lax.dot_general(
                onehot,
                compat_ref[:, u * tile_k:(u + 1) * tile_k],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )  # [TB, TK] = count * ck, exact
            gkey = counts_ck + (kb * unroll + u)
            if lo is None:
                lo, hi = gkey, None
            elif hi is None:
                lo, hi = jnp.minimum(lo, gkey), jnp.maximum(lo, gkey)
            else:
                lo2 = jnp.minimum(lo, gkey)
                hi = jnp.minimum(hi, jnp.maximum(lo, gkey))
                lo = lo2
        prev1 = m1s[:]
        m1s[:] = jnp.minimum(prev1, lo)
        if hi is None:
            m2s[:] = jnp.minimum(m2s[:], jnp.maximum(prev1, lo))
        else:
            m2s[:] = jnp.minimum(
                jnp.minimum(m2s[:], hi), jnp.maximum(prev1, lo)
            )

        @pl.when(kb == n_steps - 1)
        def _emit():
            colid = jax.lax.broadcasted_iota(jnp.int32, (tile_b, tile_k), 1)
            ext1 = m1s[:] * tile_k + colid  # (count, tile, column) lex key
            ext_init = init << st
            g1 = jnp.min(ext1, axis=1, keepdims=True)  # [TB, 1]
            masked = jnp.where(ext1 == g1, ext_init, ext1)
            g2 = jnp.minimum(
                jnp.min(masked, axis=1, keepdims=True),
                jnp.min(m2s[:] * tile_k + colid, axis=1, keepdims=True),
            )
            bestc = g1 >> (sk + st)
            best = jnp.minimum(bestc, MAX_COUNT)
            kbb = (g1 >> st) & (ck - 1)
            idx = kbb * tile_k + (g1 & (tile_k - 1))
            nxt = jnp.minimum(g2 >> (sk + st), MAX_COUNT)
            cid8 = jax.lax.broadcasted_iota(jnp.int32, (tile_b, 8), 1)
            out_ref[0, :, :] = jnp.where(
                cid8 == 0,
                best,
                jnp.where(cid8 == 1, idx, jnp.where(cid8 == 2, nxt, 0)),
            )

    cls_col_host = (np.arange(wl, dtype=np.int32) // length)[:, None]

    def run_kernel(obs_vals_t_i32, compat_dev):
        import jax.numpy as jnp

        b = obs_vals_t_i32.shape[1]  # input is [L, B]
        n_b_tiles = b // tile_b
        grid = (n_b_tiles, n_steps)
        # results packed as [nB, TB, 8]: cols 0..2 = best/idx/next (8 lanes
        # keeps the accumulator in the natural rows-on-sublanes orientation)
        cls_col = jnp.asarray(cls_col_host)  # [W*L, 1]: class id per row
        if colmerge:
            body = kernel_colmerge
            scratch = [
                pltpu.VMEM((tile_b, tile_k), jnp.int32),
                pltpu.VMEM((tile_b, tile_k), jnp.int32),
            ]
        else:
            body = kernel
            scratch = [pltpu.VMEM((tile_b, 8), jnp.int32)]
        out = pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((length, tile_b), lambda i, j: (0, i)),
                pl.BlockSpec((wl, 1), lambda i, j: (0, 0)),
                pl.BlockSpec((wl, tile_k * unroll), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, tile_b, 8), lambda i, j: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_b_tiles, tile_b, 8), jnp.int32),
            scratch_shapes=scratch,
            interpret=plan.interpret,
        )(obs_vals_t_i32, cls_col, compat_dev)
        best2 = out[:, :, 0].reshape(b)
        idx2 = out[:, :, 1].reshape(b)
        next2 = out[:, :, 2].reshape(b)
        return best2, idx2, next2

    return run_kernel


def make_pallas_assign_fn(
    expected: ExpectedSet,
    max_mismatches: int,
    min_mismatch_delta: int,
    tile_b: int = 512,
    tile_k: int = 512,
    interpret: bool = False,
    packed_masks: bool = False,
    packed2: bool = False,
    compact_output: bool = False,
    mxu_dtype: str = "int8",
    _fuse_key_scale: bool = True,
    _top2_colmerge: bool = True,
    _colmerge_unroll: int = 1,
):
    """Build ``obs_bytes[B, L] -> (assigned, best, next)`` with the fused
    Pallas kernel.  B must be a multiple of ``tile_b`` (the demux pipeline
    always ships fixed-size padded batches).

    ``packed_masks``: input is ``[B, ceil(L/2)] uint8`` nib4 (two 4-bit
    IUPAC masks per byte).  ``packed2``: input is ``[B, ceil(L/4)] uint8``
    (four 2-bit ACGT codes per byte); the no-call gate is skipped — the
    caller resolves flagged ambiguous rows host-side.  ``mxu_dtype``:
    "int8" (default; double MXU rate) or "bf16".
    """
    import jax
    import jax.numpy as jnp

    if packed_masks and packed2:
        raise ValueError("packed_masks and packed2 are mutually exclusive")
    k = expected.count
    length = expected.length
    plan = plan_local_kernel(
        k,
        length,
        tile_b=tile_b,
        tile_k=tile_k,
        interpret=interpret,
        packed2=packed2,
        mxu_dtype=mxu_dtype,
        _fuse_key_scale=_fuse_key_scale,
        _top2_colmerge=_top2_colmerge,
        _colmerge_unroll=_colmerge_unroll,
    )
    compat_host = compat_for_plan(expected.masks, plan)
    nocall_budget = max_mismatches + expected.max_ns_in_barcodes
    in_dtype = jnp.int8 if plan.int8_mxu else jnp.bfloat16

    run_kernel = make_kernel_runner(plan)

    from .device_encoding import (
        byte_is_nocall,
        byte_to_mask,
        unpack_bit2,
        unpack_nib4,
    )

    # Ship the (possibly huge) compat table to device once as an argument —
    # baking it in as a program constant bloats the executable (378 MB for a
    # 737K whitelist) past remote-compiler request limits.
    compat_dev_arr = jax.device_put(compat_host.astype(in_dtype))

    @jax.jit
    def _assign(obs_in, compat_dev):
        obs_in = obs_in.astype(jnp.uint8)
        if packed2:
            vals_t = unpack_bit2(obs_in, length).T  # [L, B] codes 0..3
            nocalls = None
        elif packed_masks:
            masks = unpack_nib4(obs_in, length)
            vals_t = masks.T  # [L, B]
            nocalls = jnp.sum((masks == 15).astype(jnp.int32), axis=1)
        else:
            # transpose + mask conversion fuse into one relayout pass in XLA
            vals_t = byte_to_mask(obs_in.T)  # [L, B] int32 in 0..15
            nocalls = jnp.sum(byte_is_nocall(obs_in), axis=1)
        best, bidx, nxt = run_kernel(vals_t, compat_dev)
        if k == 1:
            # no real runner-up exists; unmasked pad columns report count L
            # here, but the spec (assign_batch_np) says MAX_COUNT
            nxt = jnp.full_like(nxt, MAX_COUNT)
        ok = (best <= max_mismatches) & (nxt - best >= min_mismatch_delta)
        if nocalls is not None:
            ok = ok & (nocalls <= nocall_budget)
        out_dtype = jnp.uint8 if (compact_output and k < 255) else jnp.int32
        assigned = jnp.where(ok, bidx, k).astype(out_dtype)
        return assigned, best, nxt

    if packed2:
        pad_byte = 0x00  # four 'A' codes
    elif packed_masks:
        pad_byte = 0x11  # 'AA' packed
    else:
        pad_byte = ord("A")

    def assign(obs_bytes):
        b = obs_bytes.shape[0]
        pad = (-b) % tile_b
        if pad:
            obs_bytes = np.ascontiguousarray(
                np.pad(np.asarray(obs_bytes), ((0, pad), (0, 0)), constant_values=pad_byte)
            )
        idx, best, nxt = _assign(obs_bytes, compat_dev_arr)
        if pad:
            idx, best, nxt = idx[:b], best[:b], nxt[:b]
        return idx, best, nxt

    # device-only instrumentation hooks (bench.py MFU accounting): the raw
    # jitted step + resident compat, and the MAC count per already-padded row
    assign.jitted = _assign
    assign.compat_dev = compat_dev_arr
    assign.macs_per_row = plan.macs_per_row
    assign.tile_b = tile_b
    return assign
