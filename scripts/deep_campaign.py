"""Deep differential campaign: the evidence behind PARITY.md's campaign
section.  Long-running by design (minutes to hours at the default counts);
the committed pytest suites run a fixed-seed subset of the same generators.

Four legs, each comparing an independent implementation pair:

1. demux: native engine vs the pure-Python/NumPy engine — byte equality of
   every decompressed output, metrics, skip counts, and error outcomes over
   randomized scenarios (structures, IUPAC whitelists, wildcard bytes,
   short reads, all output types).  A third of scenarios force the big-K
   pigeonhole path (PALLAS_K_THRESHOLD lowered) so expanded IUPAC tables
   and the memo caches face the same inputs.
2. matcher: NativeSmallKMatcher / NativeBigKMatcher vs the NumPy spec of
   the reference's BarcodeMatcher::assign (barcode_matching.rs:119-159)
   over random (K, L, mm, delta, alphabet) with repeat-heavy reads
   (cache churn) and no-call/wildcard storms.
3. subsample: native vs Python engines — identical kept record sets and
   verbatim bytes under explicit seeds across fractions/input counts.
4. malformed inputs: 8 corruption classes ('@'/'+' violations, length
   mismatches, truncations, gzip bit-flips, out-of-sync pairs, benign
   CRLF) — both engines must agree on outcome kind and contract phrase.

5. dedup windows: the device window-dedup front-end
   (``_wrap_window_dedup``) vs the unwrapped call — bit-exact across
   window sizes, packed widths, and duplication factors.

Round-5 additions: clustered (duplicate-heavy) read distributions are a
first-class demux scenario class; the window-dedup front-end is rotated
ON/OFF across scenarios; and a quarter of non-bigk demux scenarios force
the measured-placement probe to the DEVICE side so the XLA matcher (and
its dedup wrapper) runs through the full e2e loop differentially.

Usage: python scripts/deep_campaign.py [n_demux] [n_matcher] [n_subsample]
       [n_malformed] [n_dedup] [seed_offset]

``seed_offset`` (also env ``FQTK_CAMPAIGN_OFFSET``) shifts every leg's
per-case seed so successive sweeps explore fresh scenarios instead of
replaying the same fixed seeds; scenario-class rotation (alphabets,
corruption kinds) stays index-based so coverage of each class is unchanged.
"""

import gzip
import os
import random
import sys
import tempfile
from pathlib import Path

import numpy as np

OFFSET = int(os.environ.get("FQTK_CAMPAIGN_OFFSET", "0"))

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from fqtk_tpu.core.encoding import ENCODE_LUT  # noqa: E402
from fqtk_tpu.io import native as native_io  # noqa: E402
from fqtk_tpu.ops.matcher import ExpectedSet, assign_batch_np  # noqa: E402
from fqtk_tpu.runtime import subsample as ss  # noqa: E402
import fqtk_tpu.runtime.demux as dmx  # noqa: E402
from fqtk_tpu.runtime.demux import DemuxConfig, run_demux  # noqa: E402
from test_fuzz_differential import _random_scenario  # noqa: E402


def _pack(obs: np.ndarray) -> np.ndarray:
    masks = ENCODE_LUT[obs].astype(np.uint8)
    n, length = masks.shape
    if length % 2:
        masks = np.concatenate([masks, np.zeros((n, 1), np.uint8)], axis=1)
    return (masks[:, 0::2] | (masks[:, 1::2] << 4)).astype(np.uint8)


def _force_device_placement(tmp: Path) -> dict:
    """Patch the measured-placement probe so the DEVICE side wins: the
    native engine then drives the real (XLA-on-CPU here) device matcher —
    including the window-dedup front-end — through the full e2e loop.
    Returns the saved attributes for _restore_placement."""
    saved = {
        "probe": dmx._probe_allowed,
        "host": dmx._time_host_window,
        "floor": dmx._device_floor_seconds,
        "dev": dmx._time_device_window,
        "cache": dmx._CROSSOVER_CACHE_PATH,
    }
    dmx._probe_allowed = lambda: True
    dmx._time_host_window = lambda m, w, reps=2: 1.0
    dmx._device_floor_seconds = lambda b, w, reps=2: 1e-6
    dmx._time_device_window = lambda fn, ws: 1e-6
    dmx._CROSSOVER_CACHE_PATH = str(tmp / "crossover.json")
    return saved


def _restore_placement(saved: dict) -> None:
    dmx._probe_allowed = saved["probe"]
    dmx._time_host_window = saved["host"]
    dmx._device_floor_seconds = saved["floor"]
    dmx._time_device_window = saved["dev"]
    dmx._CROSSOVER_CACHE_PATH = saved["cache"]


def demux_leg(n: int) -> int:
    fails = 0
    ok_count = 0
    device_forced = 0
    default_threshold = dmx.PALLAS_K_THRESHOLD
    dedup_env_default = os.environ.get("FQTK_DEVICE_DEDUP")
    try:
        for sid in range(n):
            rng = random.Random(31337 + OFFSET + sid)
            with tempfile.TemporaryDirectory() as td:
                tmp = Path(td)
                inputs, structures, meta = _random_scenario(rng, tmp, sid)
                max_mm = rng.choice([0, 1, 2])
                delta = rng.choice([0, 1, 2])
                batch = rng.choice([5, 64, 131072])
                force_bigk = sid % 3 == 0
                # r5: exercise the measured-placement probe in BOTH
                # directions (host is the CPU default) and rotate the
                # window-dedup front-end ON/OFF across device scenarios
                force_device = not force_bigk and sid % 4 == 1
                # device-forced sids are all odd (sid % 4 == 1), so the
                # dedup rotation must NOT key on sid parity or the
                # dedup-OFF device path would never run; alternate by
                # device-scenario ordinal instead
                os.environ["FQTK_DEVICE_DEDUP"] = "01"[(sid // 4) % 2]
                placement_saved = (
                    _force_device_placement(tmp) if force_device else None
                )
                if force_device:
                    device_forced += 1
                dmx.PALLAS_K_THRESHOLD = 1 if force_bigk else default_threshold
                dmx._ASSIGN_FN_CACHE.clear()
                res = {}
                try:
                    for engine in ("native", "numpy"):
                        try:
                            res[engine] = (
                                "ok",
                                run_demux(
                                    DemuxConfig(
                                        inputs=inputs,
                                        read_structures=structures,
                                        sample_metadata=meta,
                                        output=tmp / f"o_{engine}",
                                        output_types=["T", "B", "M", "C"],
                                        max_mismatches=max_mm,
                                        min_mismatch_delta=delta,
                                        skip_reasons=["too-few-bases"],
                                        batch_size=batch,
                                        engine=engine,
                                    )
                                ),
                            )
                        except Exception as e:  # compared, not suppressed
                            res[engine] = ("err", f"{type(e).__name__}: {e}")
                finally:
                    if placement_saved is not None:
                        _restore_placement(placement_saved)
                if res["native"][0] != res["numpy"][0]:
                    print(f"FAIL demux {sid}: outcome mismatch {res}")
                    fails += 1
                    continue
                if res["native"][0] == "err":
                    if res["native"][1] != res["numpy"][1]:
                        print(f"FAIL demux {sid}: error text {res}")
                        fails += 1
                    continue
                if res["native"][1].skip_counts != res["numpy"][1].skip_counts:
                    print(f"FAIL demux {sid}: skip counts")
                    fails += 1
                    continue
                ok_count += 1
                on, op = tmp / "o_native", tmp / "o_numpy"
                # compare the UNION of both listings: a file present on only
                # one side is itself a divergence, not a skip
                names = sorted(
                    {f.name for f in on.glob("*")} | {g.name for g in op.glob("*")}
                )
                for name in names:
                    f, g = on / name, op / name
                    if not (f.exists() and g.exists()):
                        print(
                            f"FAIL demux {sid}: {name} only in "
                            f"{'native' if f.exists() else 'numpy'} output"
                        )
                        fails += 1
                        continue
                    a = gzip.open(f, "rb").read() if f.suffix == ".gz" else f.read_bytes()
                    b = gzip.open(g, "rb").read() if g.suffix == ".gz" else g.read_bytes()
                    if a != b:
                        print(f"FAIL demux {sid}: {name} differs (bigk={force_bigk})")
                        fails += 1
    finally:
        # a crashed scenario must not leave the module-global threshold
        # (or the dedup env toggle) forced for subsequent callers
        dmx.PALLAS_K_THRESHOLD = default_threshold
        if dedup_env_default is None:
            os.environ.pop("FQTK_DEVICE_DEDUP", None)
        else:
            os.environ["FQTK_DEVICE_DEDUP"] = dedup_env_default
    if n > 0 and ok_count == 0:
        print("FAIL demux leg: no scenario completed successfully")
        fails += 1
    print(
        f"demux leg: {n} scenarios ({ok_count} ran ok, {device_forced} "
        f"device-placed, dedup rotated on/off), {fails} failures"
    )
    return fails


def dedup_leg(n: int) -> int:
    """Window-dedup front-end differential: ``_wrap_window_dedup(call)``
    must be bit-exact vs the unwrapped call for ANY per-row-deterministic
    matcher, across window sizes, packed widths (>8 bytes must bypass),
    and duplication factors including the clustered single-cell shape."""
    from fqtk_tpu.runtime.demux import _wrap_window_dedup

    fails = 0
    engaged = 0
    for case in range(n):
        rng = np.random.default_rng(424000 + OFFSET + case)
        b = int(rng.integers(64, 20000))
        w = int(rng.integers(1, 11))  # widths >8 must bypass
        n_uniq = int(rng.integers(1, max(2, b)))
        pool = rng.integers(0, 256, size=(n_uniq, w), dtype=np.uint8)
        rows = pool[rng.integers(0, n_uniq, size=b)]

        def call(obs):
            obs = np.asarray(obs, dtype=np.uint8)
            # deterministic per-row function of contents (stand-in matcher:
            # identical packed rows must always score identically)
            h = obs.astype(np.uint64)
            acc = np.zeros(obs.shape[0], dtype=np.uint64)
            for j in range(obs.shape[1]):
                acc = acc * np.uint64(1099511628211) + h[:, j]
            return (acc % np.uint64(977)).astype(np.int32)

        wrapped = _wrap_window_dedup(call)
        got = np.asarray(wrapped(rows))
        want = call(rows)
        if not np.array_equal(got, want):
            print(f"FAIL dedup {case}: b={b} w={w} uniq={n_uniq}")
            fails += 1
        engaged += wrapped.dedup_stats["dedup_windows"]
    if n > 0 and engaged == 0:
        print("FAIL dedup leg: the dedup path never engaged")
        fails += 1
    print(f"dedup leg: {n} windows ({engaged} engaged dedup), {fails} failures")
    return fails


def matcher_leg(n: int) -> int:
    fails = 0
    for case in range(n):
        rng = np.random.default_rng(909000 + OFFSET + case)
        length = int(rng.integers(4, 17))
        # keep K below the unique-string count for short lengths (a draw
        # loop over an exhausted space would never terminate)
        k = min(int(rng.integers(50, 3000)), 4**length // 2)
        max_mm = int(rng.integers(0, 3))
        delta = int(rng.integers(0, 3))
        alpha = ["ACGT", "ACGTN", "ACGTNRYWSKM", "ACGTU."][case % 4]
        seen, bcs = set(), []
        while len(bcs) < k:
            b = "".join(alpha[i] for i in rng.integers(0, len(alpha), size=length))
            if b not in seen:
                seen.add(b)
                bcs.append(b)
        expected = ExpectedSet.from_barcodes(bcs)
        pool_n = int(rng.integers(20, 400))
        rows = []
        weird = np.frombuffer(b"NnRYacgtX-.U", dtype=np.uint8)
        for _ in range(pool_n):
            base = list(bcs[int(rng.integers(0, k))].encode())
            for _ in range(int(rng.integers(0, max_mm + delta + 2))):
                p = int(rng.integers(0, length))
                base[p] = (
                    int(weird[int(rng.integers(0, len(weird)))])
                    if rng.integers(0, 3) == 0
                    else ord("ACGT"[int(rng.integers(0, 4))])
                )
            rows.append(bytes(base))
        pool = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(pool_n, length)
        obs = pool[rng.integers(0, pool_n, size=4000)]
        want, _, _ = assign_batch_np(obs, expected, max_mm, delta)
        want = np.where(want < 0, k, want).astype(np.int32)
        packed = _pack(obs)
        for cls, name in (
            (native_io.NativeSmallKMatcher, "smallk"),
            (native_io.NativeBigKMatcher, "bigk"),
        ):
            try:
                m = cls(bcs, max_mm, delta, threads=int(rng.integers(1, 5)))
            except native_io.NativeDemuxError:
                continue  # ineligible for this matcher (by design)
            for lo in range(0, 4000, 1500):  # several batches: warm caches
                got = m.assign(packed[lo : lo + 1500])
                if not np.array_equal(got, want[lo : lo + 1500]):
                    print(
                        f"FAIL matcher {case} {name} mm={max_mm} d={delta} "
                        f"L={length} K={k} alpha={alpha}"
                    )
                    fails += 1
                    break
            m.close()
    print(f"matcher leg: {n} cases x 2 matchers, {fails} failures")
    return fails


def subsample_leg(n: int) -> int:
    fails = 0
    ok_count = 0
    for case in range(n):
        rng = random.Random(77000 + OFFSET + case)
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            n_in = rng.choice([1, 2, 4])
            n_sets = rng.randint(0, 500)
            frac = rng.choice([0.0, 0.1, 0.37, 0.5, 0.93, 1.0])
            seed = rng.randint(0, 2**62)
            comp = rng.choice([None, "gz"])
            inputs = []
            for i in range(n_in):
                lines = []
                for r in range(n_sets):
                    suffix = rng.choice(["", "/1", "/2"]) if i == 0 else ""
                    comment = rng.choice(["", " some comment", "\textra\ttabs"])
                    sl = rng.randint(0, 40)
                    seq = "".join(rng.choice("ACGTN") for _ in range(sl))
                    lines.append(
                        f"@rec_{r}{suffix}{comment}\n{seq}\n+\n{'J' * sl}\n"
                    )
                p = tmp / (f"in{i}.fq" + (".gz" if comp else ""))
                data = "".join(lines).encode()
                if comp:
                    with gzip.open(p, "wb") as f:
                        f.write(data)
                else:
                    p.write_bytes(data)
                inputs.append(p)
            res = {}
            for engine in ("native", "python"):
                try:
                    r = ss.run_subsample(
                        ss.SubsampleConfig(
                            inputs=inputs,
                            output=tmp / f"o_{engine}",
                            fraction=frac,
                            seed=seed,
                        ),
                        use_native=engine == "native",
                    )
                    res[engine] = ("ok", r.total_read, r.total_kept)
                except Exception as e:
                    res[engine] = ("err", f"{type(e).__name__}: {e}")
            if res["native"] != res["python"]:
                print(f"FAIL subsample {case}: outcome {res}")
                fails += 1
                continue
            if res["native"][0] == "ok":
                ok_count += 1
                for i in range(1, n_in + 1):
                    a = gzip.open(tmp / f"o_native.R{i}.fq.gz", "rb").read()
                    b = gzip.open(tmp / f"o_python.R{i}.fq.gz", "rb").read()
                    if a != b:
                        print(f"FAIL subsample {case}: R{i} differs")
                        fails += 1
    if n > 0 and ok_count == 0:
        # a systemic failure (e.g. an API drift making both engines raise
        # the same error) must not masquerade as a clean campaign
        print("FAIL subsample leg: no scenario completed successfully")
        fails += 1
    print(f"subsample leg: {n} scenarios ({ok_count} ran ok), {fails} failures")
    return fails


def malformed_leg(n: int) -> int:
    """Malformed-input differential: corrupt a valid scenario one way and
    require BOTH engines to reach the same outcome kind — an error for the
    corruption classes, identical success for the benign ones (CRLF).  For
    the scanner's own contract classes both error texts must carry the same
    contract phrase; IO-layer corruption (gzip bit-flips, truncated
    compressed streams) legitimately yields different decoder messages, so
    only the outcome kind is compared there."""
    corruptions = [
        "crlf",           # benign: CR-tolerant scanners, byte-equal outputs
        "no_at",          # header line without '@'
        "no_plus",        # separator line without '+'
        "qual_len",       # quality shorter than sequence
        "truncated",      # EOF mid-record (uncompressed input)
        "gzip_flip",      # bit-flip inside a gzip stream
        "gzip_trunc",     # compressed stream cut short
        "out_of_sync",    # paired inputs with different record counts
    ]
    contract_phrase = {
        "no_at": "FASTQ record header must start with '@'",
        "no_plus": "FASTQ separator line must start with '+'",
        "qual_len": "sequence and quality lengths differ",
        "truncated": "truncated FASTQ record",
        "out_of_sync": "out of sync",
    }
    fails = 0
    ok_count = 0
    for case in range(n):
        rng = random.Random(555000 + OFFSET + case)
        kind = corruptions[case % len(corruptions)]
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            n_reads = rng.randint(4, 60)
            bcs = ["GATTACAG", "TTTTCCCC", "AAAAGGGG"]
            meta = tmp / "meta.tsv"
            meta.write_text(
                "sample_id\tbarcode\n"
                + "".join(f"s{i}\t{b}\n" for i, b in enumerate(bcs))
            )
            eol = b"\r\n" if kind == "crlf" else b"\n"

            def fq_bytes(count, mutate_row=None):
                out = bytearray()
                for r in range(count):
                    bc = bcs[r % len(bcs)].encode()
                    seq = bc + b"ACGTACGT"
                    lines = [
                        b"@r%d 1:N:0:0" % r,
                        seq,
                        b"+",
                        b"I" * len(seq),
                    ]
                    if mutate_row is not None and r == mutate_row:
                        lines = mutate_row_fn(lines)
                    for ln in lines:
                        out += ln + eol
                return bytes(out)

            bad_row = rng.randint(0, n_reads - 1)

            def mutate_row_fn(lines):
                if kind == "no_at":
                    return [lines[0][1:]] + lines[1:]
                if kind == "no_plus":
                    return lines[:2] + [b"*"] + lines[3:]
                if kind == "qual_len":
                    return lines[:3] + [lines[3][:-2]]
                return lines

            mutate = bad_row if kind in ("no_at", "no_plus", "qual_len") else None
            data1 = fq_bytes(n_reads, mutate)
            data2 = fq_bytes(n_reads if kind != "out_of_sync" else n_reads - 2)
            if kind == "truncated":
                # cut mid-record: keep the bad record's header only
                cut = data1.rfind(b"@r%d " % bad_row)
                data1 = data1[: cut + 8]
            p1, p2 = tmp / "in1.fq", tmp / "in2.fq"
            if kind in ("gzip_flip", "gzip_trunc"):
                p1, p2 = tmp / "in1.fq.gz", tmp / "in2.fq.gz"
                z1 = bytearray(gzip.compress(data1))
                if kind == "gzip_flip":
                    z1[len(z1) // 2] ^= 0x55
                else:
                    z1 = z1[: max(20, len(z1) * 2 // 3)]
                p1.write_bytes(bytes(z1))
                p2.write_bytes(gzip.compress(data2))
            else:
                p1.write_bytes(data1)
                p2.write_bytes(data2)

            res = {}
            for engine in ("native", "numpy"):
                try:
                    r = run_demux(
                        DemuxConfig(
                            inputs=[p1, p2],
                            read_structures=["8B+T", "+T"],
                            sample_metadata=meta,
                            output=tmp / f"o_{engine}",
                            max_mismatches=1,
                            min_mismatch_delta=2,
                            batch_size=16,
                            engine=engine,
                        )
                    )
                    res[engine] = ("ok", r.total_templates)
                except Exception as e:
                    res[engine] = ("err", f"{type(e).__name__}: {e}")
            if res["native"][0] != res["numpy"][0]:
                print(f"FAIL malformed {case} [{kind}]: outcome mismatch {res}")
                fails += 1
                continue
            if kind == "crlf":
                if res["native"][0] != "ok" or res["native"][1] != n_reads:
                    print(f"FAIL malformed {case} [crlf]: {res}")
                    fails += 1
                    continue
                diff = False
                names = sorted(
                    {p.name for p in (tmp / "o_native").glob("*.fq.gz")}
                    | {p.name for p in (tmp / "o_numpy").glob("*.fq.gz")}
                )
                for name in names:
                    try:
                        a = gzip.open(tmp / "o_native" / name, "rb").read()
                        b = gzip.open(tmp / "o_numpy" / name, "rb").read()
                    except OSError:
                        # present on only one side — itself a divergence
                        print(f"FAIL malformed {case} [crlf]: {name} one-sided")
                        diff = True
                        continue
                    if a != b:
                        print(f"FAIL malformed {case} [crlf]: {name} differs")
                        diff = True
                if diff:
                    fails += 1
                    continue
            else:
                if res["native"][0] != "err":
                    print(f"FAIL malformed {case} [{kind}]: both succeeded {res}")
                    fails += 1
                    continue
                phrase = contract_phrase.get(kind)
                if phrase and not (
                    phrase in res["native"][1] and phrase in res["numpy"][1]
                ):
                    print(
                        f"FAIL malformed {case} [{kind}]: contract phrase "
                        f"missing {res}"
                    )
                    fails += 1
                    continue
            ok_count += 1
    if n > 0 and ok_count == 0:
        print("FAIL malformed leg: no scenario completed")
        fails += 1
    print(f"malformed leg: {n} scenarios ({ok_count} ran ok), {fails} failures")
    return fails


def main() -> int:
    n_demux = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    n_matcher = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    n_subsample = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    n_malformed = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    n_dedup = int(sys.argv[5]) if len(sys.argv) > 5 else 200
    global OFFSET
    if len(sys.argv) > 6:
        OFFSET = int(sys.argv[6])
    if OFFSET:
        print(f"seed offset: {OFFSET}")
    fails = (
        demux_leg(n_demux)
        + matcher_leg(n_matcher)
        + subsample_leg(n_subsample)
        + malformed_leg(n_malformed)
        + dedup_leg(n_dedup)
    )
    print(f"deep_campaign: {'CLEAN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
