"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: end-to-end ``demux`` reads/sec on the dual-index paired-end config
(BASELINE.json config #2: I1+I2+R1+R2, 8B+9B, 96 samples, max-mismatches=1,
min-delta=2) with the native engine (C++ pipelined host I/O + JAX/XLA
matcher), measured on this machine's default JAX backend (the real TPU chip
under the driver).  The ``configs`` array additionally covers every
BASELINE.md benchmark config:

1. single-end inline index (17B+T, 16 samples, 0 mismatches)
2. dual-index paired-end (the headline)
3. IUPAC/N expected barcodes (same program shape as #1 — the whitelist is a
   runtime argument, so no extra XLA compile)
4. single-cell 16B-style 737K-barcode whitelist — matcher-level (a 737K-
   sample demux e2e is impossible for ANY implementation: fd limits), the
   product's pigeonhole path vs the reference-architecture scalar matcher
5. variable-length ``+`` read structures, paired-end (same compiled shape
   as #2)

Each e2e config reports ``vs_config_baseline`` against the measured
reference-architecture proxy run ON THE SAME INPUTS (scripts/
measure_baseline.py documents the proxy and its generous-to-baseline
deltas).  Methodology notes:

- A warmup pass per program shape runs first so cold XLA compiles (1-2 min
  via the axon remote-compile relay) are excluded; the persistent
  compilation cache is enabled as well.
- Kernel timing rotates between distinct device inputs: the axon relay
  memoizes executions on identical buffers, which otherwise inflates
  numbers ~1000x.
"""

import ctypes
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

RUST_BASELINE_READS_PER_SEC_ESTIMATE = 1.5e6

# Run lengths: long enough that the fixed per-run bubbles (process setup,
# thread spawn, first-window fill, end-of-run flush — ~80-100ms measured
# wall even with writer opens overlapped into the fill, r5) amortize to
# ~2% of wall, so e2e rates and frac_of_ceiling reflect the steady-state
# pipeline, not process startup.  Production demux jobs run minutes to
# hours; a 2.4s measurement window charged ~4% of frac to startup alone.
# Both sides of every A/B (product and reference proxy) run the same
# lengths, so the ratios are unaffected either way.
N_READS = 8_000_000
N_READS_SECONDARY = 6_000_000
WARMUP_READS = 2_000
K = 96
BC1, BC2 = 8, 9
L = BC1 + BC2
TEMPLATE_LEN = 100
BATCH = 1 << 17
#: big-K pallas tile sizes (best of the measured sweep with the
#: column-merge top-2; see DESIGN.md — the 2x[TB,TK] running-key scratch
#: bounds the tile area under the 16MB scoped-VMEM limit on v5e).  An r4
#: (256, 4096) retune did not replicate its one-window +10% under
#: interleaved same-window A/B (kernel_lab: 822-836K both), so the
#: production tiling stays (512, 2048).
PALLAS_TILE_B = 512
PALLAS_TILE_K = 2048


def rust_baseline() -> tuple:
    """(reads_per_sec, note) — measured proxy when available."""
    p = Path(__file__).resolve().parent / "BASELINE_MEASURED.json"
    if p.exists():
        d = json.loads(p.read_text())
        return float(d["value"]), (
            "vs measured reference-architecture proxy on identical inputs in "
            "the same noise window (best-of-4 both sides; pinned best-ever "
            f"proxy {d['value']/1e6:.2f}M reads/s, {d['threads']}-thread "
            "config, under vs_pinned_best_proxy)"
        )
    return RUST_BASELINE_READS_PER_SEC_ESTIMATE, (
        "vs est. 1.5M reads/s 16-thread Rust fqtk (unmeasured; no Rust "
        "toolchain in image)"
    )


def make_whitelist(k, length, seed=7, alphabet="ACGT"):
    rng = np.random.default_rng(seed)
    out, seen = [], set()
    while len(out) < k:
        bc = "".join(rng.choice(list(alphabet), size=length))
        if bc not in seen:
            seen.add(bc)
            out.append(bc)
    return out


def _writers(paths):
    import gzip

    from fqtk_tpu.io import native as native_io

    if native_io.available():
        return {
            n: native_io.NativeBgzfWriter(p, 1, threads=3)
            for n, p in paths.items()
        }
    return {n: gzip.open(p, "wb", compresslevel=1) for n, p in paths.items()}  # pragma: no cover


def write_metadata(tmp, barcodes, name="metadata.tsv"):
    meta = tmp / name
    with open(meta, "w") as fh:
        fh.write("sample_id\tbarcode\n")
        for i, b in enumerate(barcodes):
            fh.write(f"S{i:04d}\t{b}\n")
    return meta


def write_inputs(tmp: Path, barcodes, n_reads=N_READS, name=""):
    """Dual-index PE inputs (headline config).  BGZF-compressed — the
    reference's documented input workflow (``... | bgzip -c``)."""
    rng = np.random.default_rng(11)
    meta = write_metadata(tmp, barcodes, f"{name}metadata.tsv")
    choices = rng.integers(0, K, size=n_reads)
    mism = rng.integers(0, 10, size=n_reads) == 0
    tmpl = ("ACGT" * 25).encode()
    qual = b"I" * TEMPLATE_LEN
    qb1, qb2 = b"I" * BC1, b"I" * BC2
    paths = {n: tmp / f"{name}{n}.fq.gz" for n in ("i1", "r1", "r2", "i2")}
    fhs = _writers(paths)
    bcs = [barcodes[c].encode() for c in range(K)]
    chunk = 100_000
    for lo in range(0, n_reads, chunk):
        hi = min(lo + chunk, n_reads)
        p1, p2, pr = [], [], []
        for i in range(lo, hi):
            bc = bcs[choices[i]]
            b1, b2 = bc[:BC1], bc[BC1:]
            if mism[i]:
                b1 = (b"T" if b1[:1] != b"T" else b"G") + b1[1:]
            # formatted per chunk: a 2M-element header list up front is a
            # ~200MB transient for nothing
            h = b"@inst:1:AB:1:2:%d:3 1:N:0:0" % i
            p1.append(h + b"\n" + b1 + b"\n+\n" + qb1 + b"\n")
            p2.append(h + b"\n" + b2 + b"\n+\n" + qb2 + b"\n")
            pr.append(h + b"\n" + tmpl + b"\n+\n" + qual + b"\n")
        fhs["i1"].write(b"".join(p1))
        fhs["i2"].write(b"".join(p2))
        block = b"".join(pr)
        fhs["r1"].write(block)
        fhs["r2"].write(block)
    for fh in fhs.values():
        fh.close()
    return paths, meta


def write_single_end_inputs(tmp, barcodes, n_reads, name, var_template=False):
    """One FASTQ with an inline index: ``{L}B`` + template (config #1/#3);
    ``var_template=True`` varies template length (config #5 inputs)."""
    rng = np.random.default_rng(13)
    length = len(barcodes[0])
    choices = rng.integers(0, len(barcodes), size=n_reads)
    path = tmp / f"{name}.fq.gz"
    fh = _writers({"x": path})["x"]
    tmpl_full = ("ACGT" * 40).encode()
    chunk = 100_000
    for lo in range(0, n_reads, chunk):
        hi = min(lo + chunk, n_reads)
        parts = []
        for i in range(lo, hi):
            bc = barcodes[choices[i]].encode()
            tl = 100 if not var_template else 60 + (i % 81)
            seq = bc + tmpl_full[:tl]
            parts.append(
                b"@inst:1:AB:1:2:%d:3 1:N:0:0\n%s\n+\n%s\n"
                % (i, seq, b"I" * len(seq))
            )
        fh.write(b"".join(parts))
    fh.close()
    return path, length


#: published per-chip peaks for MFU accounting, keyed by jax device_kind:
#: (bf16 FLOP/s, int8 OP/s), FMA = 2 ops
_PEAK_OPS = {
    "TPU v5 lite": (1.97e14, 3.94e14),
    "TPU v5e": (1.97e14, 3.94e14),
    "TPU v4": (2.75e14, 2.75e14),
    "TPU v5": (4.59e14, 9.18e14),
    "TPU v5p": (4.59e14, 9.18e14),
    "TPU v6 lite": (9.18e14, 1.836e15),
    "TPU v6e": (9.18e14, 1.836e15),
}


def _peak_ops(dtype: str):
    import jax

    kind = jax.devices()[0].device_kind
    peaks = _PEAK_OPS.get(kind)
    if peaks is None:
        return None, kind
    return (peaks[1] if dtype == "int8" else peaks[0]), kind


def _device_only_rate(call, make_input, batches, iters=3):
    """Marginal device-compute rate (rows/s) via a two-point fit over batch
    sizes.  Methodology, forced by the relay (see module doc): inputs are
    device-resident and rotated (the relay memoizes identical executions),
    completion is forced by an on-device reduction + scalar fetch
    (block_until_ready returns early), and the fixed per-call relay cost —
    which dominates naive timings — cancels in the slope."""
    import jax
    import jax.numpy as jnp

    times = []
    for b in batches:
        ins = [jax.device_put(make_input(b)) for _ in range(iters + 1)]
        _ = int(jnp.sum(call(ins[-1])[0].astype(jnp.int32)))  # compile+warm
        t0 = time.perf_counter()
        for i in range(iters):
            _ = int(jnp.sum(call(ins[i])[0].astype(jnp.int32)))
        times.append((time.perf_counter() - t0) / iters)
    (b1, b2), (t1, t2) = batches, times
    slope = (t2 - t1) / (b2 - b1)
    if slope <= 0:
        # a noise phase flipped mid-fit (t2 <= t1): report the call-level
        # rate of the large batch as a lower bound rather than Infinity
        # (bare Infinity is invalid JSON and would break the output line)
        return b2 / t2 if t2 > 0 else 0.0
    return 1.0 / slope


#: set True in main() when the axon relay probe fails — device benches are
#: skipped (an outage hangs jax backend init IN-PROCESS, with no exception
#: to catch) and e2e placement is pinned to the host matcher
RELAY_OUTAGE = False


def relay_healthy(timeout_s: int = 240) -> bool:
    """Probe jax backend init in a SUBPROCESS with a timeout.

    During an axon relay outage every in-process ``import jax`` /
    ``jax.devices()`` hangs indefinitely (the plugin blocks at
    registration), so the probe must be a killable child.  Healthy init
    through the relay takes ~5-20s; 240s is past any observed healthy
    cold start but far below the driver's run budget."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except Exception:
        return False


def bench_kernel(barcodes):
    """Device-side assignment: e2e call throughput (reads/s) on resident
    data, plus the relay-overhead-corrected device-only rate and MFU."""
    import jax

    from fqtk_tpu.ops.matcher import ExpectedSet, make_assign_fn

    expected = ExpectedSet.from_barcodes(barcodes)
    assign = make_assign_fn(expected, 1, 2)
    batch = 1 << 22  # large batch amortizes the relay's ~25ms fixed per-call cost
    iters = 5
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    inputs = [
        jax.device_put(rng.choice(bases, size=(batch, L)).astype(np.uint8))
        for _ in range(iters)
    ]
    import jax.numpy as jnp

    warm = jax.device_put(rng.choice(bases, size=(batch, L)).astype(np.uint8))
    int(jnp.sum(assign(warm)[0]))  # compile + warm
    del warm
    t0 = time.perf_counter()
    for i in range(iters):
        _ = int(jnp.sum(assign(inputs[i])[0]))
    dt = time.perf_counter() - t0
    call_rate = batch * iters / dt

    dev_rate = _device_only_rate(
        assign,
        lambda b: rng.choice(bases, size=(b, L)).astype(np.uint8),
        batches=(1 << 21, 1 << 22),
    )
    peak, kind = _peak_ops("bf16")  # f32-accumulated dot -> bf16 MXU mode
    ops = 2.0 * assign.macs_per_row * dev_rate
    device = {
        "kind": kind,
        "device_only_reads_per_sec": round(dev_rate, 1),
        "achieved_tops": round(ops / 1e12, 2),
        "device_mfu": round(ops / peak, 4) if peak else None,
        "note": "two-point batch fit on resident inputs; relay fixed cost "
        "cancels in the slope (K=96 keeps the MXU tiny by design — the "
        "big-K pallas entry is the MXU-bound datapoint)",
    }
    return call_rate, device


def _demux_cfg(inputs, structures, meta, out_dir, max_mm=1, delta=2):
    from fqtk_tpu.runtime.demux import DemuxConfig

    return DemuxConfig(
        inputs=list(inputs),
        read_structures=list(structures),
        sample_metadata=meta,
        output=out_dir,
        max_mismatches=max_mm,
        min_mismatch_delta=delta,
        batch_size=BATCH,
        engine="auto",
        # experiment knob for scripts/ab_e2e.py arms (pool size = threads-2)
        threads=int(os.environ.get("FQTK_BENCH_THREADS", "8")),
    )


def host_speed_of_light(e2e_rps, n_reads, stage_timings, inputs=None):
    """E2e "speed-of-light" on THIS host: every demux architecture (ours and
    the reference's) must inflate, scan, reformat, and re-deflate the same
    bytes.  Those irreducible stages' measured thread-CPU, spread perfectly
    over all cores with a zero-cost matcher, bound any implementation's
    throughput here; report that bound and our fraction of it.

    The flat-spread ceiling is OPTIMISTIC for single-input configs: the
    bench inputs are single-member gzip streams, and inflate within one
    deflate member is inherently serial (each block's dictionary is the
    previous output), so no implementation can spread the slowest input's
    inflate CPU across cores.  When `inputs` is given, a decompress-only
    calibration pass measures that serial bound and the report includes
    the tighter min(ceiling, serial bound) plus our fraction of it."""
    io_keys = ("native_parse", "native_gate_pack", "native_route",
               "native_compress")
    io_core_s = sum(stage_timings.get(k, 0.0) for k in io_keys)
    if io_core_s <= 0:
        return None
    cores = os.cpu_count() or 1
    ceiling = n_reads * cores / io_core_s
    out = {
        "cores": cores,
        "io_core_seconds": round(io_core_s, 3),
        "assign_free_ceiling_reads_per_sec": round(ceiling, 1),
        "frac_of_ceiling": round(e2e_rps / ceiling, 3),
        "note": "ceiling = measured inflate+parse+route+deflate thread-CPU "
        "(paid by ANY implementation at this gzip level) spread over all "
        "cores with a free matcher",
    }
    # Hypervisor steal during the measured run: stolen vCPU time stretches
    # wall without adding thread-CPU, so it depresses frac_of_ceiling
    # through no fault of the pipeline.  Report the frac against the cores
    # the VM actually got (the honest pipeline-quality number; raw frac
    # above stays the conservative headline).
    steal = stage_timings.get("steal_frac", 0.0)
    if steal > 0:
        avail_ceiling = n_reads * cores * (1.0 - steal) / io_core_s
        out["steal_frac_during_run"] = steal
        out["frac_of_available_ceiling"] = round(e2e_rps / avail_ceiling, 3)
    # Per-input serial floor: record framing + extraction within one FASTQ
    # stream is sequential, so for n_inputs < cores the flat spread is
    # optimistic and the slowest input's parse CPU caps any implementation
    # (same accounting as the subsample entry; assumes symmetric inputs).
    parse_s = stage_timings.get("native_parse", 0.0)
    if inputs and parse_s > 0 and len(inputs) < cores:
        serial_bound = n_reads * len(inputs) / parse_s
        achievable = min(ceiling, serial_bound)
        out.setdefault(
            "per_input_serial_parse_bound_reads_per_sec", round(serial_bound, 1)
        )
        out["achievable_ceiling_reads_per_sec"] = round(achievable, 1)
        out["frac_of_achievable"] = round(e2e_rps / achievable, 3)
    if inputs:
        try:
            from fqtk_tpu.io import native as native_io

            if native_io.available():
                results = [native_io.inflate_bench(p) for p in inputs]
                # the serial bound only exists for single-member gzip
                # inputs; multi-member/BGZF streams are block-parallel
                # decodable in principle, so no implementation-independent
                # serial cap can be claimed for them
                serial = [cpu for _, cpu, kind in results if kind == "gzip"]
                if serial:
                    serial_s = max(serial)
                    serial_bound = n_reads / serial_s
                    achievable = min(ceiling, serial_bound)
                    out.update(
                        serial_inflate_s_max=round(serial_s, 3),
                        serial_inflate_bound_reads_per_sec=round(
                            serial_bound, 1
                        ),
                        achievable_ceiling_reads_per_sec=round(achievable, 1),
                        frac_of_achievable=round(e2e_rps / achievable, 3),
                        serial_note="single-member gzip input(s): the "
                        "slowest one's measured serial inflate CPU caps ANY "
                        "implementation; achievable = min(flat-spread "
                        "ceiling, serial bound)",
                    )
                else:
                    out["input_kind"] = results[0][2] if results else None
        except Exception:
            pass  # calibration is advisory; never fail the bench over it
    return out


def _read_steal_ticks():
    """(steal_ticks, wall_s) from /proc/stat — field 8 of the aggregate cpu
    line is core-ticks stolen by the hypervisor (other tenants running on
    our vCPUs).  Stolen cores stretch wall time without adding thread-CPU,
    so they depress frac_of_ceiling through no fault of the pipeline."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]), time.perf_counter()
    except Exception:
        return 0, time.perf_counter()


def run_e2e(tmp, inputs, structures, meta, n_reads, tag, trials=2,
            max_mm=1, delta=2, warm_inputs=None):
    """Best-of-N e2e run; returns (reads_per_sec, timings of best)."""
    from fqtk_tpu.runtime.demux import run_demux

    if warm_inputs is not None:
        run_demux(
            _demux_cfg(
                warm_inputs, structures, meta, tmp / f"warm_{tag}",
                max_mm=max_mm, delta=delta,
            )
        )
    best, best_t = 0.0, {}
    for trial in range(trials):
        s0, w0 = _read_steal_ticks()
        t0 = time.perf_counter()
        result = run_demux(
            _demux_cfg(
                inputs, structures, meta, tmp / f"out_{tag}{trial}",
                max_mm=max_mm, delta=delta,
            )
        )
        dt = time.perf_counter() - t0
        s1, w1 = _read_steal_ticks()
        assert result.total_templates == n_reads, (result.total_templates, n_reads)
        if n_reads / dt > best:
            best = n_reads / dt
            best_t = {k: round(v, 3) for k, v in result.timings.items()}
            # USER_HZ=100; steal is summed over all vCPUs already
            avail = (os.cpu_count() or 1) * (w1 - w0) * 100.0
            best_t["steal_frac"] = round((s1 - s0) / avail, 4) if avail else 0.0
    return best, best_t


def run_refproxy(tmp, inputs, structures, barcodes, n_reads, tag,
                 max_mm=1, delta=2, trials=2, threads=16):
    """Reference-architecture proxy on the same inputs; best-of-N reads/s."""
    from fqtk_tpu.core.read_structure import ReadStructure, SegmentType
    from fqtk_tpu.io import native as native_io

    if not native_io.available():
        return None
    rss = [ReadStructure.from_str(s) for s in structures]
    bc_len = len(barcodes[0])
    best = 0.0
    for trial in range(trials):
        out_dir = tmp / f"proxy_{tag}{trial}"
        out_dir.mkdir()
        engine = native_io.NativeDemuxEngine(
            threads=max(1, threads - 3), compression_level=5
        )
        try:
            for path, rs in zip(inputs, rss):
                engine.add_input(
                    str(path),
                    str(rs),
                    [(s.offset, s.length, s.kind.value) for s in rs],
                )
            n_t = sum(len(rs.segments_by_type(SegmentType.Template)) for rs in rss)
            names = [f"S{i:04d}" for i in range(len(barcodes))] + ["unmatched"]
            for name in names:
                engine.add_sample(
                    [str(out_dir / f"{name}.R{i}.fq.gz") for i in range(1, n_t + 1)]
                )
            engine.configure(
                bc_len=bc_len,
                nocall_budget=max_mm,
                skip_too_few=False,
                first_sample_id="S0000",
                first_barcode=barcodes[0],
                out_types="T",
            )
            t0 = time.perf_counter()
            total = engine.refproxy_run(barcodes, max_mm, delta)
            dt = time.perf_counter() - t0
        finally:
            engine.close()
        assert total == n_reads, (total, n_reads)
        best = max(best, n_reads / dt)
    return best


def run_config_ab(
    tmp, inputs, structures, meta, barcodes, n_reads, tag, trials=2,
    max_mm=1, delta=2, warm_inputs=None, proxy_threads=16,
):
    """Interleaved A/B: alternate product and proxy trials so a VM noise
    phase that flips mid-config hits BOTH sides instead of skewing the
    ratio (sequential best-of-N blocks pair badly across a phase edge).
    Returns (best_e2e, timings_of_best, best_proxy)."""
    best_e2e, best_t, best_proxy = 0.0, {}, 0.0
    for trial in range(trials):
        rps, t = run_e2e(
            tmp, inputs, structures, meta, n_reads, f"{tag}{trial}",
            trials=1, max_mm=max_mm, delta=delta,
            warm_inputs=warm_inputs if trial == 0 else None,
        )
        if rps > best_e2e:
            best_e2e, best_t = rps, t
        p = run_refproxy(
            tmp, inputs, structures, barcodes, n_reads, f"{tag}{trial}",
            max_mm=max_mm, delta=delta, trials=1, threads=proxy_threads,
        )
        if p:
            best_proxy = max(best_proxy, p)
    return best_e2e, best_t, best_proxy


def bench_midk_config():
    """Mid-K (host-matcher cap < K < pigeonhole threshold): here the TPU
    device path IS the production auto-choice — brute force is too big for
    the host but the [B, K] contraction is MXU food.  Since the
    column-merge top-2 landed, the production engine is the fused pallas
    kernel (bit2 transfer, int8 MXU) rather than the XLA contraction (4-6x
    slower device-side at this K).  Matcher-level, proxy measured on
    identical reads (reference scalar branch-and-bound)."""
    import ctypes

    import jax
    import jax.numpy as jnp

    from fqtk_tpu.io import native as native_io
    from fqtk_tpu.ops.matcher import ExpectedSet
    from fqtk_tpu.ops.pallas_matcher import make_pallas_assign_fn

    k, length = 8192, 16
    rng = np.random.default_rng(11)
    vals = rng.choice(1 << 28, size=k + 64, replace=False)[:k].astype(np.uint32)
    codes = np.zeros((k, length), dtype=np.uint8)
    v = vals.copy()
    for j in range(length):
        codes[:, j] = v & 3
        v >>= 2
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    bc_bytes = letters[codes]
    barcodes = [bytes(r).decode() for r in bc_bytes]

    b = 1 << 17
    choice = rng.integers(0, k, size=b)
    obs = bc_bytes[choice].copy()
    mut = rng.integers(0, 10, size=b) == 0
    pos = rng.integers(0, length, size=b)
    obs[mut, pos[mut]] = letters[rng.integers(0, 4, size=int(mut.sum()))]

    expected = ExpectedSet.from_barcodes(barcodes)
    # production engine: pallas colmerge, bit2-packed transfer (the demux
    # driver's single-chip device branch, runtime/demux.py)
    fn = make_pallas_assign_fn(
        expected, 1, 2, tile_b=512, tile_k=2048, packed2=True,
        compact_output=True, mxu_dtype="int8",
    )
    code2 = np.zeros(256, dtype=np.uint8)
    for c, bb in zip((0, 1, 2, 3), b"ACGT"):
        code2[bb] = c

    def pack_bit2(byts):
        cc = code2[byts]
        return (
            cc[:, 0::4] | (cc[:, 1::4] << 2) | (cc[:, 2::4] << 4)
            | (cc[:, 3::4] << 6)
        ).astype(np.uint8)

    jitted, compat = fn.jitted, fn.compat_dev
    assign = lambda x: jitted(x, compat)  # noqa: E731

    iters = 4
    inputs = [
        jax.device_put(
            pack_bit2(bc_bytes[rng.integers(0, k, size=b)])  # rotate: relay memoizes
        )
        for _ in range(iters)
    ]
    int(jnp.sum(assign(jax.device_put(pack_bit2(obs)))[0].astype(jnp.int32)))
    t0 = time.perf_counter()
    for x in inputs:
        _ = int(jnp.sum(assign(x)[0].astype(jnp.int32)))
    call_rate = b * iters / (time.perf_counter() - t0)

    dev_rate = _device_only_rate(
        assign,
        lambda n: pack_bit2(bc_bytes[rng.integers(0, k, size=n)]),
        batches=(1 << 18, 1 << 19),
    )
    peak, kind = _peak_ops("int8")
    ops = 2.0 * fn.macs_per_row * dev_rate

    result = {
        "name": "mid_K_8192_16bp_mm1_d2",
        "level": "matcher",
        "engine": "pallas column-merge kernel, int8/bit2 (product "
        "auto-path for 4096 < K < 65536 on one chip; was the XLA "
        "contraction, 4-6x slower device-side)",
        "reads_per_sec": round(call_rate, 1),
        "device_only_reads_per_sec": round(dev_rate, 1),
        "device_kind": kind,
        "achieved_tops": round(ops / 1e12, 2),
        "device_mfu": round(ops / peak, 4) if peak else None,
        "note": "call-level rate includes the relay's fixed per-call cost "
        "at the production batch (2^17); device-only is the two-point fit",
    }

    if native_io.available():
        lib = native_io.get_lib()
        # idempotent: also declared in bench_bigk_config, but this config
        # must be callable standalone (wrong marshaling segfaults)
        lib.fqtk_refproxy_matcher_bench.restype = ctypes.c_double
        lib.fqtk_refproxy_matcher_bench.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        concat = bc_bytes.tobytes()
        cbuf = (ctypes.c_uint8 * len(concat)).from_buffer_copy(concat)
        n_proxy = 4000
        obs_c = np.ascontiguousarray(obs[:n_proxy])
        proxy_rps = float(
            lib.fqtk_refproxy_matcher_bench(
                cbuf, k, length, 1, 2,
                obs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_proxy,
            )
        )
        if proxy_rps > 0:
            result["proxy_reads_per_sec"] = round(proxy_rps, 1)
            result["vs_config_baseline"] = round(call_rate / proxy_rps, 1)
    return result


def bench_bigk_config():
    """Config #4: 737K-barcode whitelist, matcher-level (see module doc)."""
    from fqtk_tpu.core.encoding import ENCODE_LUT
    from fqtk_tpu.io import native as native_io

    if not native_io.available():
        return None
    rng = np.random.default_rng(1)
    k, length = 737_280, 16
    vals = rng.choice(
        np.iinfo(np.uint32).max, size=k + 1000, replace=False
    )[:k].astype(np.uint32)
    codes = np.zeros((k, length), dtype=np.uint8)
    v = vals.copy()
    for j in range(length):
        codes[:, j] = v & 3
        v >>= 2
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    bc_bytes = letters[codes]
    barcodes = [bytes(r).decode() for r in bc_bytes]

    b = 1 << 17
    choice = rng.integers(0, k, size=b)
    obs = bc_bytes[choice].copy()
    mut = rng.integers(0, 10, size=b) == 0
    pos = rng.integers(0, length, size=b)
    obs[mut, pos[mut]] = letters[rng.integers(0, 4, size=int(mut.sum()))]
    masks = ENCODE_LUT[obs].astype(np.uint8)
    packed = (masks[:, 0::2] | (masks[:, 1::2] << 4)).astype(np.uint8)

    # product path: pigeonhole matcher (auto-selected for K >= 65536)
    m = native_io.NativeBigKMatcher(barcodes, 1, 2, threads=4)
    m.assign(packed[:1024])  # warm
    t0 = time.perf_counter()
    out = m.assign(packed)
    dt = time.perf_counter() - t0
    pigeonhole_rps = b / dt
    matched = float((out < k).mean())

    # realistic single-cell distribution: reads cluster on ~8K cells
    # (thousands of reads per cell barcode), where the memo cache engages;
    # the uniform draw above stays the headline (conservative)
    cells = rng.integers(0, k, size=8000)
    obs_sc = bc_bytes[cells[rng.integers(0, 8000, size=b)]].copy()
    mut = rng.integers(0, 10, size=b) == 0
    pos = rng.integers(0, length, size=b)
    obs_sc[mut, pos[mut]] = letters[rng.integers(0, 4, size=int(mut.sum()))]
    masks_sc = ENCODE_LUT[obs_sc].astype(np.uint8)
    packed_sc = (masks_sc[:, 0::2] | (masks_sc[:, 1::2] << 4)).astype(np.uint8)
    m.assign(packed_sc[:4096])  # warm the cache
    t0 = time.perf_counter()
    m.assign(packed_sc)
    clustered_rps = b / (time.perf_counter() - t0)
    m.close()

    # degenerate-whitelist variant: one expected N per barcode exercises
    # the expanded-table path (BigKMatcher iupac mode)
    bc_n = bc_bytes.copy()
    bc_n[np.arange(k), rng.integers(0, length, size=k)] = ord("N")
    mi = native_io.NativeBigKMatcher(
        [bytes(r).decode() for r in bc_n], 1, 2, threads=4
    )
    mi.assign(packed[:1024])
    t0 = time.perf_counter()
    mi.assign(packed)
    iupac_rps = b / (time.perf_counter() - t0)
    mi.close()

    # baseline proxy: the reference's scalar branch-and-bound + cache
    lib = native_io.get_lib()
    lib.fqtk_refproxy_matcher_bench.restype = ctypes.c_double
    lib.fqtk_refproxy_matcher_bench.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    concat = bc_bytes.tobytes()
    cbuf = (ctypes.c_uint8 * len(concat)).from_buffer_copy(concat)
    n_proxy = 2000  # scalar scan is slow; extrapolating from 2K reads
    obs_c = np.ascontiguousarray(obs[:n_proxy])
    proxy_rps = float(
        lib.fqtk_refproxy_matcher_bench(
            cbuf, k, length, 1, 2,
            obs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_proxy,
        )
    )
    result = {
        "name": "single_cell_737K_whitelist_16B",
        "level": "matcher",
        "reads_per_sec": round(pigeonhole_rps, 1),
        "engine": "pigeonhole (product auto-path for K>=65536)",
        "matched_frac": round(matched, 4),
        "clustered_8k_cells_reads_per_sec": round(clustered_rps, 1),
        "iupac_whitelist_reads_per_sec": round(iupac_rps, 1),
        "proxy_reads_per_sec": round(proxy_rps, 1),
        "vs_config_baseline": round(pigeonhole_rps / proxy_rps, 1)
        if proxy_rps > 0
        else None,
        "note": "737K-sample demux e2e impossible for any implementation "
        "(fd limits); both sides measured matcher-level on identical reads",
    }
    if RELAY_OUTAGE:
        result["device_pallas"] = {
            "error": "axon relay outage; device benches skipped"
        }
        return result
    try:
        result["device_pallas"] = _bench_bigk_pallas(barcodes, obs)
    except Exception as e:  # device path unavailable (CPU-only driver host)
        result["device_pallas"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    return result


def _bench_bigk_pallas(barcodes, obs):
    """The fused Pallas kernel on the same 737K whitelist (the big-K IUPAC
    fallback path, and the MXU-bound MFU datapoint): int8 MXU + bit2-packed
    observations, device-only rate via the two-point fit."""
    import jax

    from fqtk_tpu.ops.matcher import ExpectedSet
    from fqtk_tpu.ops.pallas_matcher import make_pallas_assign_fn

    if jax.default_backend() == "cpu":
        return {"skipped": "cpu backend"}
    expected = ExpectedSet.from_barcodes(barcodes)
    fn = make_pallas_assign_fn(
        expected, 1, 2, tile_b=PALLAS_TILE_B, tile_k=PALLAS_TILE_K,
        packed2=True, compact_output=True, mxu_dtype="int8",
    )
    code = np.zeros(256, dtype=np.uint8)
    for c, bb in zip((0, 1, 2, 3), b"ACGT"):
        code[bb] = c
    codes = code[obs]
    packed = (
        codes[:, 0::4] | (codes[:, 1::4] << 2) | (codes[:, 2::4] << 4)
        | (codes[:, 3::4] << 6)
    ).astype(np.uint8)
    rng = np.random.default_rng(9)

    def make_input(b):
        reps = -(-b // packed.shape[0])
        tiled = np.tile(packed, (reps, 1))[:b]
        # perturb so every buffer is distinct (relay memoization)
        tiled[rng.integers(0, b, size=64), 0] ^= 3
        return tiled

    jitted = fn.jitted
    compat = fn.compat_dev
    rate = _device_only_rate(
        lambda x: jitted(x, compat), make_input, batches=(1 << 17, 1 << 18)
    )
    peak, kind = _peak_ops("int8")
    ops = 2.0 * fn.macs_per_row * rate

    # clustered single-cell distribution through the production dedup
    # front-end (_wrap_window_dedup): thousands of reads per cell barcode
    # shrink the device batch by the duplication factor — call-level rate
    # including the np.unique + scatter host work
    from fqtk_tpu.runtime.demux import _wrap_window_dedup

    b_c = 1 << 17
    cells = rng.integers(0, packed.shape[0], size=8192)
    ded = _wrap_window_dedup(lambda o: fn(o)[0])
    for _ in range(2):  # warm (compile the bucket shape)
        ded(packed[cells[rng.integers(0, 8192, size=b_c)]])
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        _ = np.asarray(ded(packed[cells[rng.integers(0, 8192, size=b_c)]]))
    clustered_rate = b_c * iters / (time.perf_counter() - t0)

    return {
        "kind": kind,
        "mode": "int8 MXU, bit2-packed obs, "
        f"tiles ({PALLAS_TILE_B}, {PALLAS_TILE_K})",
        "device_only_reads_per_sec": round(rate, 1),
        "achieved_tops": round(ops / 1e12, 2),
        "device_mfu": round(ops / peak, 4) if peak else None,
        "clustered_8k_cells_dedup_reads_per_sec": round(clustered_rate, 1),
        "note_dedup": "call-level rate on the clustered distribution "
        "through the window-dedup front-end (unique rows -> pow2 bucket "
        "-> device -> scatter); uniform-draw device_only rate above is "
        "the dedup-free worst case",
    }


def bench_subsample_config(tmp: Path, paths):
    """Subsample e2e (PE pair, fraction 0.3) vs the reference-architecture
    proxy: the identical engine forced into the serial record-at-a-time
    lockstep loop with per-record draws folded in (``subsample.rs:175-304``:
    one reader thread + pooled BGZF writers).  The product path adds one
    reader thread per input (the keep mask is pre-drawn, so inputs decouple)
    (decode-ahead is opt-in after the r4 A/B; see DESIGN.md)."""
    from fqtk_tpu.io import native as native_io
    from fqtk_tpu.runtime.subsample import SubsampleConfig, run_subsample
    from fqtk_tpu.utils.chacha import ChaCha8Rng

    if not native_io.available():
        return None
    inputs = [paths["r1"], paths["r2"]]

    # interleaved A/B (see run_config_ab): a noise-phase flip mid-config
    # hits both sides instead of skewing the ratio
    best = 0.0
    proxy_best = 0.0
    best_stats = None
    for trial in range(2):
        cfg = SubsampleConfig(
            inputs=inputs,
            output=tmp / f"sub{trial}",
            fraction=0.3,
            threads=8,
            seed=42,
        )
        t0 = time.perf_counter()
        res = run_subsample(cfg)
        dt = time.perf_counter() - t0
        if res.total_read / dt > best:
            best = res.total_read / dt
            best_stats = res.stage_seconds
        n_subsample_reads = res.total_read

        # generous-to-baseline: the proxy's mask stream uses the fast
        # native ChaCha (~13ns/draw, close to Rust's inline per-record
        # draw) rather than charging it the NumPy stream's ~50ns inside
        # its timed serial loop
        try:
            rng = native_io.NativeChaChaMask(42)
            draw = lambda m: rng.keep_mask(m, 0.3)  # noqa: E731
        except native_io.NativeDemuxError:  # stale .so
            rng = ChaCha8Rng(42)
            draw = lambda m: (  # noqa: E731
                rng.random_f64_batch(m) < 0.3
            ).astype("uint8")
        eng = native_io.NativeSubsampleEngine(threads=7, compression_level=5)
        try:
            for i, p in enumerate(inputs):
                eng.add_input(p, tmp / f"subproxy{trial}.R{i + 1}.fq.gz")
            eng.configure(check_names=True, parallel=False)
            t0 = time.perf_counter()
            total = 0
            while True:
                mask = draw(1 << 16)
                c, _ = eng.process_chunk(mask)
                total += c
                if c < len(mask):
                    break
            eng.finish()
        finally:
            eng.close()
        dt = time.perf_counter() - t0
        proxy_best = max(proxy_best, total / dt)

    entry = {
        "name": "subsample_PE_fraction0.3",
        "level": "e2e",
        "reads_per_sec": round(best, 1),
        "proxy_reads_per_sec": round(proxy_best, 1),
        "vs_config_baseline": round(best / proxy_best, 2) if proxy_best else None,
    }
    # Host-ceiling accounting (VERDICT r4 item 6): subsample's irreducible
    # work is inflate+scan+name-check+record-copy plus BGZF re-deflate of
    # the kept records — measured thread-CPU, spread over all cores.
    if best_stats:
        io_core_s = best_stats["native_work"] + best_stats["native_compress"]
        if io_core_s > 0:
            cores = os.cpu_count() or 1
            ceiling = n_subsample_reads * cores / io_core_s
            entry["host_speed_of_light"] = {
                "cores": cores,
                "io_core_seconds": round(io_core_s, 3),
                "assign_free_ceiling_reads_per_sec": round(ceiling, 1),
                "frac_of_ceiling": round(best / ceiling, 3),
                "note": "ceiling = measured inflate+scan+name-check+copy + "
                "BGZF deflate thread-CPU (paid by ANY implementation at this "
                "gzip level) spread over all cores",
            }
            # The flat spread is unattainable for n_inputs < cores: record
            # framing within one FASTQ stream is inherently sequential, so
            # the slowest input's scan thread-CPU is a serial floor ANY
            # implementation pays (DESIGN.md round-5 subsample section).
            work = best_stats["native_work"]
            if work > 0 and len(inputs) < cores:
                serial_bound = n_subsample_reads * len(inputs) / work
                achievable = min(ceiling, serial_bound)
                entry["host_speed_of_light"].update(
                    per_input_serial_bound_reads_per_sec=round(
                        serial_bound, 1
                    ),
                    achievable_ceiling_reads_per_sec=round(achievable, 1),
                    frac_of_achievable=round(best / achievable, 3),
                    serial_note="per-input record framing is sequential; "
                    "bound = n * n_inputs / scan thread-CPU (assumes "
                    "symmetric inputs)",
                )
    return entry


def main():
    global RELAY_OUTAGE
    from fqtk_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    barcodes = make_whitelist(K, L)
    if not relay_healthy():
        # record host-side results rather than hanging the whole bench:
        # pin e2e placement to the host matcher (no device probe) and skip
        # every device-level measurement with an explicit note
        RELAY_OUTAGE = True
        os.environ["FQTK_HOST_MATCHER_MAX_K"] = str(1 << 62)
        kernel_rps, kernel_device = 0.0, {
            "error": "axon relay outage: jax backend init hung in the "
            "probe subprocess; device benches skipped, e2e placement "
            "pinned to host"
        }
    else:
        kernel_rps, kernel_device = bench_kernel(barcodes)
    configs = []
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)

        # ---- headline: dual-index PE, 96 samples ----
        wpaths, wmeta = write_inputs(tmp, barcodes, n_reads=WARMUP_READS, name="w_")
        paths, meta = write_inputs(tmp, barcodes, n_reads=N_READS)
        di_inputs = [paths["i1"], paths["r1"], paths["r2"], paths["i2"]]
        di_structs = ["8B", "100T", "100T", "9B"]
        e2e_rps, stage_timings, proxy_di = run_config_ab(
            tmp, di_inputs, di_structs, meta, barcodes, N_READS, "headline",
            trials=4,
            warm_inputs=[wpaths["i1"], wpaths["r1"], wpaths["r2"], wpaths["i2"]],
        )
        configs.append(
            {
                "name": "dual_index_PE_96samples_8B9B_mm1_d2",
                "level": "e2e",
                "reads_per_sec": round(e2e_rps, 1),
                "proxy_reads_per_sec": round(proxy_di, 1) if proxy_di else None,
                "vs_config_baseline": round(e2e_rps / proxy_di, 2) if proxy_di else None,
                "host_speed_of_light": host_speed_of_light(
                    e2e_rps, N_READS, stage_timings, inputs=di_inputs
                ),
            }
        )

        # never lose the whole bench (and the headline line) to one
        # secondary config: record the failure as that config's entry instead
        def guarded(name, fn, *a):
            try:
                entry = fn(*a)
            except Exception as e:
                entry = {"name": name, "error": f"{type(e).__name__}: {e}"[:200]}
            if entry:
                configs.append(entry)

        # ---- config 1: single-end inline 17B+T, 16 samples, mm=0 ----
        def bench_single_end_config():
            se_bcs = make_whitelist(16, 17, seed=21)
            se_meta = write_metadata(tmp, se_bcs, "se_meta.tsv")
            wse, _ = write_single_end_inputs(tmp, se_bcs, WARMUP_READS, "w_se")
            se_path, _ = write_single_end_inputs(
                tmp, se_bcs, N_READS_SECONDARY, "se"
            )
            se_rps, se_t, proxy_se = run_config_ab(
                tmp, [se_path], ["17B+T"], se_meta, se_bcs, N_READS_SECONDARY,
                "se", trials=3, max_mm=0, delta=2, warm_inputs=[wse],
            )
            return {
                "name": "single_end_inline_17B+T_16samples_mm0",
                "level": "e2e",
                "reads_per_sec": round(se_rps, 1),
                "proxy_reads_per_sec": round(proxy_se, 1) if proxy_se else None,
                "vs_config_baseline": round(se_rps / proxy_se, 2) if proxy_se else None,
                "host_speed_of_light": host_speed_of_light(
                    se_rps, N_READS_SECONDARY, se_t, inputs=[se_path]
                ),
            }

        guarded("single_end_inline_17B+T_16samples_mm0", bench_single_end_config)

        # ---- config 3: IUPAC/N expected barcodes (same shape as #1) ----
        def bench_iupac_config():
            iupac_bcs = make_whitelist(16, 17, seed=23)
            iupac_bcs = [
                b[:4] + "N" + b[5:10] + "RY"[i % 2] + b[11:]
                for i, b in enumerate(iupac_bcs)
            ]
            iu_meta = write_metadata(tmp, iupac_bcs, "iu_meta.tsv")
            iu_reads = [b.replace("N", "A").replace("R", "G").replace("Y", "C")
                        for b in iupac_bcs]
            iu_path, _ = write_single_end_inputs(
                tmp, iu_reads, N_READS_SECONDARY, "iu"
            )
            iu_rps, iu_t, proxy_iu = run_config_ab(
                tmp, [iu_path], ["17B+T"], iu_meta, iupac_bcs, N_READS_SECONDARY,
                "iu", trials=3, max_mm=1, delta=2,
            )
            return {
                "name": "iupac_N_expected_barcodes_17B+T_16samples",
                "level": "e2e",
                "reads_per_sec": round(iu_rps, 1),
                "proxy_reads_per_sec": round(proxy_iu, 1) if proxy_iu else None,
                "vs_config_baseline": round(iu_rps / proxy_iu, 2) if proxy_iu else None,
                "host_speed_of_light": host_speed_of_light(
                    iu_rps, N_READS_SECONDARY, iu_t, inputs=[iu_path]
                ),
            }

        guarded("iupac_N_expected_barcodes_17B+T_16samples", bench_iupac_config)

        # ---- config 5: variable-length '+' structures, PE (headline shape) ----
        def bench_varlen_config():
            v1, _ = write_single_end_inputs(
                tmp, [b[:BC1] for b in barcodes], N_READS_SECONDARY, "v1",
                var_template=True,
            )
            v2, _ = write_single_end_inputs(
                tmp, [b[BC1:] for b in barcodes], N_READS_SECONDARY, "v2",
                var_template=True,
            )
            var_rps, var_t, proxy_var = run_config_ab(
                tmp, [v1, v2], ["8B+T", "9B+T"], meta, barcodes,
                N_READS_SECONDARY, "var", trials=3,
            )
            return {
                "name": "variable_length_plus_structures_PE_96samples",
                "level": "e2e",
                "reads_per_sec": round(var_rps, 1),
                "proxy_reads_per_sec": round(proxy_var, 1) if proxy_var else None,
                "vs_config_baseline": round(var_rps / proxy_var, 2) if proxy_var else None,
                "host_speed_of_light": host_speed_of_light(
                    var_rps, N_READS_SECONDARY, var_t, inputs=[v1, v2]
                ),
                "note": "multi-host streaming validated separately "
                "(tests/test_multiprocess.py on a 2-process jax.distributed run)",
            }

        guarded("variable_length_plus_structures_PE_96samples", bench_varlen_config)

        # ---- config 4: 737K single-cell whitelist (matcher-level) ----
        guarded("single_cell_737K_whitelist_16B", bench_bigk_config)

        # ---- mid-K: the device XLA path is the production auto-choice ----
        if RELAY_OUTAGE:
            configs.append({
                "name": "mid_K_8192_16bp_mm1_d2",
                "error": "axon relay outage; device-path config skipped",
            })
        else:
            guarded("mid_K_8192_16bp_mm1_d2", bench_midk_config)

        # ---- subsample: the other half of the CLI surface ----
        guarded("subsample_PE_fraction0.3", bench_subsample_config, tmp, paths)

    baseline_rps, baseline_note = rust_baseline()
    full = {
        "metric": "demux_e2e_reads_per_sec",
        "value": round(e2e_rps, 1),
        "unit": "reads/s",
        # vs_baseline is the CONTROLLED comparison: product and
        # reference-architecture proxy measured back-to-back on the
        # same inputs in the same noise window (this VM has ~2x
        # noisy-neighbor phases lasting tens of minutes, so ratios
        # against numbers from other windows are not meaningful).
        # The best-ever-observed pinned proxy is kept alongside.
        "vs_baseline": round(e2e_rps / proxy_di, 4)
        if proxy_di
        else round(e2e_rps / baseline_rps, 4),
        "vs_pinned_best_proxy": round(e2e_rps / baseline_rps, 4),
        "kernel_assign_reads_per_sec": round(kernel_rps, 1),
        "kernel_device": kernel_device,
        "stage_seconds": stage_timings,
        "config": "dual-index PE, 96 samples, 8B+9B, max_mm=1, delta=2, native engine",
        "baseline_note": baseline_note,
        "configs": configs,
    }
    if RELAY_OUTAGE:
        full["relay_outage"] = True
    print(json.dumps(full))
    # The driver keeps only the TAIL of the bench output, so the big line
    # above can lose its headline fields to truncation.  Persist the full
    # record to disk and re-print a compact headline-last summary so any
    # tail capture still carries the numbers that matter.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"), "w"
        ) as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "demux_e2e_reads_per_sec",
                "headline_reads_per_sec": full["value"],
                "unit": "reads/s",
                "vs_baseline": full["vs_baseline"],
                "configs_vs_baseline": {
                    c["name"]: c.get("vs_config_baseline")
                    for c in configs
                },
                "value": full["value"],
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
