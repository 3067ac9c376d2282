"""Real-chip A/B: K-sharded mesh path vs the non-mesh Pallas kernel.

VERDICT r3 done-criterion for the mesh upgrade: on a 1-device mesh, the
per-device big-K throughput of ``make_sharded_assign_fn`` must land within
~10% of the plain ``make_pallas_assign_fn`` (the 795K reads/s single-chip
kernel) — proving multi-chip users now get single-chip per-device speed.

Methodology is bench.py's two-point batch fit on resident inputs (the axon
relay memoizes identical executions and has a ~25ms fixed per-call cost that
cancels in the slope).

Run on the real chip:  python scripts/mesh_ab.py [K] [L]
"""

import sys
import time

import numpy as np


def pack_bit2(obs_codes: np.ndarray) -> np.ndarray:
    b, length = obs_codes.shape
    w = -(-length // 4) * 4
    padded = np.zeros((b, w), dtype=np.uint8)
    padded[:, :length] = obs_codes
    return (
        padded[:, 0::4] | (padded[:, 1::4] << 2) | (padded[:, 2::4] << 4)
        | (padded[:, 3::4] << 6)
    ).astype(np.uint8)


def unique_barcodes(k: int, length: int):
    vals = (np.arange(k, dtype=np.uint64) * 2654435761) % (1 << (2 * length))
    vals = np.unique(vals)
    extra = np.setdiff1d(
        np.arange(k + 65536, dtype=np.uint64), vals, assume_unique=False
    )
    vals = np.concatenate([vals, extra])[:k]
    codes = np.zeros((k, length), dtype=np.uint8)
    v = vals.copy()
    for j in range(length):
        codes[:, j] = v & 3
        v >>= 2
    return codes


def device_only_rate(call, make_input, batches, iters=3):
    import jax
    import jax.numpy as jnp

    times = []
    for b in batches:
        ins = [jax.device_put(make_input(b)) for _ in range(iters + 1)]
        _ = int(jnp.sum(jnp.asarray(call(ins[-1])).astype(jnp.int32)))
        t0 = time.perf_counter()
        for i in range(iters):
            _ = int(jnp.sum(jnp.asarray(call(ins[i])).astype(jnp.int32)))
        times.append((time.perf_counter() - t0) / iters)
    (b1, b2), (t1, t2) = batches, times
    slope = (t2 - t1) / (b2 - b1)
    return (1.0 / slope if slope > 0 else b2 / t2), times


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 737280
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax

    from fqtk_tpu.ops.matcher import ExpectedSet
    from fqtk_tpu.ops.pallas_matcher import make_pallas_assign_fn
    from fqtk_tpu.parallel.mesh import make_demux_mesh, make_sharded_assign_fn
    from fqtk_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    codes = unique_barcodes(k, length)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    barcodes = [bytes(r).decode() for r in letters[codes]]
    expected = ExpectedSet.from_barcodes(barcodes)
    rng = np.random.default_rng(5150)

    def make_input(b):
        return pack_bit2(codes[rng.integers(0, k, size=b)])

    batches = (1 << 16, 1 << 17)

    # A: non-mesh production kernel
    plain = make_pallas_assign_fn(
        expected, 1, 2, tile_b=512, tile_k=2048, packed2=True,
        compact_output=False, mxu_dtype="int8",
    )
    rate_a, times_a = device_only_rate(
        lambda x: plain.jitted(x, plain.compat_dev)[0], make_input, batches
    )
    print(f"A nonmesh : {rate_a:12.1f} reads/s  times={times_a}")

    # B: 1-device mesh, same kernel per shard
    mesh = make_demux_mesh(n_batch=1, n_whitelist=1, devices=jax.devices()[:1])
    sharded = make_sharded_assign_fn(
        expected, 1, 2, mesh, packed2=True, with_counts=False,
        use_pallas=True, tile_b=512, tile_k=2048,
    )
    assert sharded.use_pallas
    rate_b, times_b = device_only_rate(
        lambda x: sharded.jitted(x, sharded.compat_dev), make_input, batches
    )
    print(f"B mesh    : {rate_b:12.1f} reads/s  times={times_b}")
    print(f"mesh/nonmesh ratio: {rate_b / rate_a:.3f}")

    # correctness spot-check on one batch
    obs = make_input(4096)
    a = np.asarray(plain(obs)[0])
    b = np.asarray(sharded(obs))
    np.testing.assert_array_equal(a, b.astype(a.dtype))
    print("outputs identical on 4096-read spot check")


if __name__ == "__main__":
    main()
