"""Pallas TPU kernel for fused barcode matching.

The XLA path (:func:`fqtk_tpu.ops.matcher.make_assign_fn`) materializes the
one-hot expansion ``obs16[B, L*16]`` and per-chunk count matrices in HBM.
This kernel fuses the whole pipeline per tile in VMEM:

    obs 4-bit masks [TB, L]  --repeat+compare-->  one-hot [TB, L*16] (VMEM)
    one-hot @ compat tile [L*16, TK]  (MXU, bf16 x bf16 -> f32, exact since
                                       counts <= 255 < 2^24)
    tile top-2 (min / argmin-first / second-min)  (VPU)
    running (best, idx, next) merge across K tiles  (VMEM scratch)

HBM traffic per batch: obs masks [B, L] once + compat once per B tile +
3 output vectors — no [B, K] intermediate, which is what makes 737K-barcode
whitelists feasible at full speed.

Grid: ``(nB, nK)`` with K minormost; the scratch accumulator carries across
the K tiles of one B tile (standard accumulator pattern).  Tie-breaks match
the reference scan (first index wins, ``barcode_matching.rs:132``) because
``jnp.argmin`` picks the first minimum within a tile and the cross-tile merge
prefers the earlier tile on ties.
"""

from __future__ import annotations


import numpy as np

from .matcher import MAX_COUNT, ExpectedSet


def _compat_bf16(expected: ExpectedSet, k_padded: int) -> np.ndarray:
    """Mismatch-indicator table in *class-major* row layout ``c*L + l``.

    ``pltpu.repeat(masks, 16, axis=1)`` tiles the whole [TB, L] block 16
    times, so kernel column ``j`` corresponds to position ``l = j % L`` and
    mask class ``c = j // L`` — the row order here must match.
    """
    length, k = expected.length, expected.count
    c = np.arange(16, dtype=np.uint8)
    # viol[c, l, k] = 1 iff mask value c has a bit outside expected (k, l)
    viol = (c[:, None, None] & ~expected.masks.T[None, :, :]) & 0xF  # [16, L, K]
    compat = (viol != 0).astype(np.float32).reshape(16 * length, k)
    if k_padded != k:
        pad = np.ones((compat.shape[0], k_padded - k), dtype=np.float32)
        compat = np.concatenate([compat, pad], axis=1)
    return compat


def make_pallas_assign_fn(
    expected: ExpectedSet,
    max_mismatches: int,
    min_mismatch_delta: int,
    tile_b: int = 512,
    tile_k: int = 512,
    interpret: bool = False,
    packed_masks: bool = False,
    compact_output: bool = False,
):
    """Build ``obs_bytes[B, L] -> (assigned, best, next)`` with the fused
    Pallas kernel.  B must be a multiple of ``tile_b`` (the demux pipeline
    always ships fixed-size padded batches)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = expected.count
    length = expected.length
    if length > 255:
        raise ValueError(
            "pallas matcher supports barcode lengths <= 255 (combined-key "
            "exactness bound); use the XLA engine for longer barcodes"
        )
    l16 = length * 16
    tile_k = min(tile_k, max(128, 1 << (k - 1).bit_length()))
    n_k_tiles = -(-k // tile_k)
    k_padded = n_k_tiles * tile_k
    compat_host = _compat_bf16(expected, k_padded)
    nocall_budget = max_mismatches + expected.max_ns_in_barcodes

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

        masks_t = obs_ref[:]  # [L, TB] int32 (4-bit mask values, transposed)
        # The observed batch comes in TRANSPOSED ([L, B]) so each DMA row is
        # tile_b contiguous bytes — with [B, L] rows of ~17 elements the DMA
        # spends ~50ns/row of descriptor overhead, which dominated runtime.
        # One-hot over the 16 mask values; pltpu.repeat tiles the block, so
        # row j maps to (l = j % L, c = j // L) — class-major layout,
        # matching _compat_bf16's row order.  The per-row class constant
        # comes in as an input (cls_ref) so no per-step integer division.
        rep = pltpu.repeat(masks_t, repeats=16, axis=0)  # [16*L, TB] tiled
        onehot = (rep == cls_ref[:]).astype(jnp.bfloat16)

        counts_f = jax.lax.dot_general(
            onehot,
            compat_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TB, TK], exact integers <= L <= 255

        # combined-key top-2: key = count * TK + col packs (count, index)
        # so a single min yields both with the first-occurrence tie-break
        # (exact in f32: 255 * TK + TK - 1 < 2^23 for TK <= 2^15); key
        # uniqueness (distinct col) lets the second-best mask compare keys.
        lcolf = jax.lax.broadcasted_iota(jnp.int32, (tile_b, tile_k), 1).astype(
            jnp.float32
        )
        tkf = float(tile_k)
        big = float(MAX_COUNT) * tkf
        key = counts_f * tkf + lcolf
        pad = (lcolf + (kb * tile_k).astype(jnp.float32)) >= float(k)
        key = jnp.where(pad, big, key)
        m1 = jnp.min(key, axis=1, keepdims=True)  # [TB, 1]
        m2 = jnp.min(jnp.where(key == m1, big, key), axis=1, keepdims=True)
        cbf = jnp.floor(m1 / tkf)
        tile_best = jnp.minimum(cbf, float(MAX_COUNT)).astype(jnp.int32)
        tile_idx = (m1 - cbf * tkf).astype(jnp.int32) + kb * tile_k
        tile_next = jnp.minimum(jnp.floor(m2 / tkf), float(MAX_COUNT)).astype(
            jnp.int32
        )

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

    def run_kernel(obs_masks_t_i32, compat_dev):
        b = obs_masks_t_i32.shape[1]  # input is [L, B]
        n_b_tiles = b // tile_b
        grid = (n_b_tiles, n_k_tiles)
        # results packed as [nB, TB, 8]: cols 0..2 = best/idx/next (8 lanes
        # keeps the accumulator in the natural rows-on-sublanes orientation)
        cls_col = jnp.asarray(
            (np.arange(l16, dtype=np.int32) // length)[:, None]
        )  # [16L, 1]: class id per row
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((length, tile_b), lambda i, j: (0, i)),
                pl.BlockSpec((l16, 1), lambda i, j: (0, 0)),
                pl.BlockSpec((l16, tile_k), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, tile_b, 8), lambda i, j: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_b_tiles, tile_b, 8), jnp.int32),
            scratch_shapes=[pltpu.VMEM((tile_b, 8), jnp.int32)],
            interpret=interpret,
        )(obs_masks_t_i32, cls_col, compat_dev)
        best2 = out[:, :, 0].reshape(b)
        idx2 = out[:, :, 1].reshape(b)
        next2 = out[:, :, 2].reshape(b)
        return best2, idx2, next2

    from .device_encoding import byte_is_nocall, byte_to_mask

    # Ship the (possibly huge) compat table to device once as an argument —
    # baking it in as a program constant bloats the executable (378 MB for a
    # 737K whitelist) past remote-compiler request limits.
    import jax as _jax

    compat_dev_arr = _jax.device_put(compat_host.astype(jnp.bfloat16))

    @jax.jit
    def _assign(obs_in, compat_dev):
        obs_in = obs_in.astype(jnp.uint8)
        b = obs_in.shape[0]
        if packed_masks:
            lo = (obs_in & 0xF).astype(jnp.int32)
            hi = (obs_in >> 4).astype(jnp.int32)
            masks = jnp.stack([lo, hi], axis=-1).reshape(b, -1)[:, :length]
            masks_t = masks.T  # [L, B]
            nocalls = jnp.sum((masks == 15).astype(jnp.int32), axis=1)
        else:
            # transpose + mask conversion fuse into one relayout pass in XLA
            masks_t = byte_to_mask(obs_in.T)  # [L, B] int32 in 0..15
            nocalls = jnp.sum(byte_is_nocall(obs_in), axis=1)
        best, bidx, nxt = run_kernel(masks_t, compat_dev)
        ok = (
            (nocalls <= nocall_budget)
            & (best <= max_mismatches)
            & (nxt - best >= min_mismatch_delta)
        )
        out_dtype = jnp.uint8 if (compact_output and k < 255) else jnp.int32
        assigned = jnp.where(ok, bidx, k).astype(out_dtype)
        return assigned, best, nxt

    pad_byte = 0x11 if packed_masks else ord("A")  # 'AA' packed / 'A'

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

    return assign
