"""Interleaved A/B of the single-end e2e config: pipe ramp on vs off.

Diagnoses the r4 single_end regression (frac_of_ceiling 0.595, 0.93x proxy
in BENCH r4-initial vs r3's 0.79-0.90 range): alternates ramp-on and
ramp-off trials on identical inputs so a VM noise phase hits both arms.

Run: python scripts/ab_single_end.py [trials_per_arm] [n_reads]
"""

import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from fqtk_tpu.runtime.demux import run_demux

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        bcs = bench.make_whitelist(16, 17, seed=21)
        meta = bench.write_metadata(tmp, bcs, "se_meta.tsv")
        path, _ = bench.write_single_end_inputs(tmp, bcs, n_reads, "se")
        warm, _ = bench.write_single_end_inputs(tmp, bcs, 200_000, "w_se")

        # warm both arms
        for arm in ("1", "0"):
            os.environ["FQTK_PIPE_RAMP"] = arm
            run_demux(
                bench._demux_cfg(
                    [warm], ["17B+T"], meta, tmp / f"warm{arm}",
                    max_mm=0, delta=2,
                )
            )

        results = {"1": [], "0": []}
        timings = {"1": {}, "0": {}}
        for t in range(trials):
            for arm in ("1", "0"):
                os.environ["FQTK_PIPE_RAMP"] = arm
                t0 = time.perf_counter()
                res = run_demux(
                    bench._demux_cfg(
                        [path], ["17B+T"], meta, tmp / f"out{arm}_{t}",
                        max_mm=0, delta=2,
                    )
                )
                dt = time.perf_counter() - t0
                assert res.total_templates == n_reads
                rps = n_reads / dt
                results[arm].append(rps)
                if rps >= max(results[arm]):
                    timings[arm] = {
                        k: round(v, 3) for k, v in res.timings.items()
                    }
                print(f"trial {t} ramp={arm}: {rps/1e6:.3f}M reads/s")

        for arm in ("1", "0"):
            best = max(results[arm])
            sol = bench.host_speed_of_light(best, n_reads, timings[arm])
            print(
                f"ramp={arm}: best {best/1e6:.3f}M  "
                f"median {sorted(results[arm])[len(results[arm])//2]/1e6:.3f}M  "
                f"frac_of_ceiling {sol['frac_of_ceiling'] if sol else '?'}  "
                f"io_core_s {sol['io_core_seconds'] if sol else '?'}"
            )
            print(f"  timings: {timings[arm]}")


if __name__ == "__main__":
    main()
