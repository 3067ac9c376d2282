"""Multi-device demux: data-parallel reads x K-sharded whitelists.

The reference is single-process multi-threaded (SURVEY.md §2c); its only
parallelism is a 3-stage host pipeline.  The TPU-native scale-out replaces it
with a 2-D device mesh:

- ``batch`` axis: FASTQ record batches stream data-parallel — each device
  matches its shard of reads.  Host-side sharding; no collectives needed for
  assignment itself.
- ``whitelist`` axis: the expected-barcode table is sharded over K for huge
  whitelists (e.g. 737K single-cell barcodes).  Each shard computes a local
  (best, idx, next) triple; shards merge with an ``all_gather`` over the
  whitelist axis followed by an ordered fold of the same associative monoid
  used for K-chunking (:func:`fqtk_tpu.ops.matcher.merge_top2`) — ascending
  shard order preserves the reference's first-index tie-break.

Per-sample template counts are computed on device (one-hot sum) and reduced
with ``psum`` over the batch axis, reproducing the reference's single global
``DemuxMetric`` counts (associative integer sums, SURVEY.md §5).

Multi-host: the same program runs under ``jax.distributed`` with each host
feeding its input shard; counts ride the same ``psum`` (ICI within a slice,
DCN across hosts).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.matcher import MAX_COUNT, ExpectedSet, merge_top2


def make_demux_mesh(
    n_batch: Optional[int] = None, n_whitelist: int = 1, devices=None
):
    """Create a ``(batch, whitelist)`` mesh over the available devices."""
    import jax

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_batch is None:
        assert n % n_whitelist == 0, (n, n_whitelist)
        n_batch = n // n_whitelist
    assert n_batch * n_whitelist <= n
    dev_array = np.asarray(devices[: n_batch * n_whitelist]).reshape(
        n_batch, n_whitelist
    )
    return jax.sharding.Mesh(dev_array, ("batch", "whitelist"))


def _pad_axis(arr: np.ndarray, axis: int, multiple: int, fill) -> np.ndarray:
    size = arr.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def make_sharded_assign_fn(
    expected: ExpectedSet,
    max_mismatches: int,
    min_mismatch_delta: int,
    mesh,
    k_chunk: int = 16384,
    packed_masks: bool = False,
    compact_output: bool = False,
    with_counts: bool = True,
):
    """Build the sharded demux step: ``obs[B, L] -> (assigned[B], counts[K+1])``.

    - ``obs`` is sharded over the ``batch`` mesh axis.
    - the compat table is sharded over the ``whitelist`` axis (replicated when
      that axis has size 1).
    - ``assigned`` comes back sharded over ``batch``; ``counts`` (per-sample
      template totals, with unmatched in slot K) is fully reduced
      (psum over both axes) and replicated.

    ``packed_masks``: input is ``[B, ceil(L/2)] uint8`` (two 4-bit IUPAC
    masks per byte, low nibble first — the native engine's layout).
    ``compact_output``: uint8 ``assigned`` when ``K < 255``.
    ``with_counts=False`` returns only ``assigned`` (the product pipeline
    counts host-side where skip/length flags are applied).

    The returned callable is jitted; call it with a numpy/JAX array whose
    leading dim is divisible by the batch-axis size.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def shard_map(f, *, mesh, in_specs, out_specs):
        try:  # jax >= 0.8
            return jax.shard_map(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
            )
        except (AttributeError, TypeError):  # pragma: no cover
            from jax.experimental.shard_map import shard_map as _sm

            return _sm(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
            )

    k = expected.count
    length = expected.length
    n_k_shards = mesh.shape["whitelist"]
    nocall_budget = max_mismatches + expected.max_ns_in_barcodes

    # Pad K to a multiple of the whitelist axis; padding columns always lose.
    compat = expected.compat  # [L*16, K] int8
    k_padded = k + ((-k) % n_k_shards)
    if k_padded != k:
        pad = np.ones((compat.shape[0], k_padded - k), dtype=np.int8)
        compat = np.concatenate([compat, pad], axis=1)
    k_per_shard = k_padded // n_k_shards

    from ..ops.device_encoding import byte_is_nocall, byte_to_mask, unpack_nib4

    def _obs_masks(obs_in):
        if packed_masks:
            return unpack_nib4(obs_in, length)
        return byte_to_mask(obs_in)

    def local_top2(obs_bytes, compat_local):
        """Per-device top-2 over the local K shard (chunked like the
        single-device path so [b_local, K_local] never materializes whole)."""
        b = obs_bytes.shape[0]
        obs_masks = _obs_masks(obs_bytes)
        onehot = (
            obs_masks[:, :, None] == jnp.arange(16, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.int8)
        obs16 = onehot.reshape(b, length * 16)

        kc = min(k_chunk, k_per_shard)
        n_chunks = -(-k_per_shard // kc)
        kc_padded = n_chunks * kc
        if kc_padded != k_per_shard:
            compat_local = jnp.concatenate(
                [
                    compat_local,
                    jnp.ones((length * 16, kc_padded - k_per_shard), dtype=jnp.int8),
                ],
                axis=1,
            )
        cc = compat_local.reshape(length * 16, n_chunks, kc).transpose(1, 0, 2)

        shard_idx = jax.lax.axis_index("whitelist")
        shard_off = shard_idx * k_per_shard

        def body(carry, xs):
            chunk_i, chunk_compat = xs
            counts = jax.lax.dot_general(
                obs16,
                chunk_compat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            counts = jnp.minimum(counts, MAX_COUNT)
            col = jnp.arange(kc, dtype=jnp.int32) + chunk_i * kc
            # global column index; mask shard padding AND global padding
            counts = jnp.where(col[None, :] < k_per_shard, counts, MAX_COUNT)
            gcol = col + shard_off
            counts = jnp.where(gcol[None, :] < k, counts, MAX_COUNT)
            cb = jnp.min(counts, axis=-1)
            ci = jnp.argmin(counts, axis=-1).astype(jnp.int32) + chunk_i * kc
            colm = jnp.arange(kc, dtype=jnp.int32)
            masked = jnp.where(
                colm[None, :] == (ci - chunk_i * kc)[:, None], MAX_COUNT, counts
            )
            cn = (
                jnp.min(masked, axis=-1)
                if kc > 1
                else jnp.full_like(cb, MAX_COUNT)
            )
            return merge_top2(carry, (cb, ci, cn)), None

        init = (
            jnp.full((b,), MAX_COUNT, dtype=jnp.int32),
            jnp.full((b,), k_per_shard, dtype=jnp.int32),
            jnp.full((b,), MAX_COUNT, dtype=jnp.int32),
        )
        if n_chunks == 1:
            (best, bidx, nxt), _ = body(init, (jnp.int32(0), cc[0]))
        else:
            (best, bidx, nxt), _ = jax.lax.scan(
                body, init, (jnp.arange(n_chunks, dtype=jnp.int32), cc)
            )
        return best, bidx + shard_off, nxt

    def step(obs_bytes, compat_sharded):
        # local phase: each (batch, whitelist) tile computes its local top-2
        best, bidx, nxt = local_top2(obs_bytes, compat_sharded)

        # merge across whitelist shards in ascending shard order (preserves
        # first-index tie-break of the reference scan)
        if n_k_shards > 1:
            g = jax.lax.all_gather((best, bidx, nxt), "whitelist")  # [nk, b]
            acc = (g[0][0], g[1][0], g[2][0])
            for s in range(1, n_k_shards):
                acc = merge_top2(acc, (g[0][s], g[1][s], g[2][s]))
            best, bidx, nxt = acc

        if packed_masks:
            nocalls = jnp.sum((_obs_masks(obs_bytes) == 15).astype(jnp.int32), axis=1)
        else:
            nocalls = jnp.sum(byte_is_nocall(obs_bytes), axis=1)
        ok = (
            (nocalls <= nocall_budget)
            & (best <= max_mismatches)
            & (nxt - best >= min_mismatch_delta)
        )
        out_dtype = jnp.uint8 if (compact_output and k < 255) else jnp.int32
        assigned = jnp.where(ok, bidx, k).astype(out_dtype)

        if not with_counts:
            return assigned

        # per-sample counts: one-hot sum over the local batch, then psum over
        # the batch axis (whitelist axis already sees identical values)
        onehot_counts = jnp.sum(
            (
                assigned.astype(jnp.int32)[:, None]
                == jnp.arange(k + 1, dtype=jnp.int32)[None, :]
            ).astype(jnp.int32),
            axis=0,
        )
        counts = jax.lax.psum(onehot_counts, "batch")
        return assigned, counts

    P_obs = P("batch", None)
    P_compat = P(None, "whitelist")
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P_obs, P_compat),
        out_specs=(P("batch"), P(None)) if with_counts else P("batch"),
    )
    jitted = jax.jit(sharded)

    compat_dev = jax.device_put(
        compat, NamedSharding(mesh, P_compat)
    )

    def assign(obs_bytes):
        obs_bytes = jnp.asarray(obs_bytes, dtype=jnp.uint8)
        return jitted(obs_bytes, compat_dev)

    assign.mesh = mesh
    assign.n_k_shards = n_k_shards
    return assign
