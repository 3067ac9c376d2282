"""Multi-host demux aggregation tests (single-process simulation: the
collective degenerates to identity; shard orchestration and exact metric
merging are what's validated here)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from fqtk_tpu.parallel.distributed import merge_host_counts, run_demux_multihost
from fqtk_tpu.runtime.demux import DemuxConfig, run_demux

from .util import fastq_file, metadata_file


def test_merge_host_counts_single_process_identity():
    c = np.array([3, 1, 4, 1, 5], dtype=np.int64)
    np.testing.assert_array_equal(merge_host_counts(c), c)


def test_multihost_shard_run_and_metrics(tmp_path):
    barcodes = ["AAAA", "CCCC"]
    sample_metadata = metadata_file(tmp_path, barcodes)
    # two "lanes" with different read mixes
    lane0 = fastq_file(
        tmp_path, "lane0", "l0", ["AAAA" + "G" * 10] * 3 + ["CCCC" + "G" * 10]
    )
    out = tmp_path / "out"
    cfg = DemuxConfig(
        inputs=[lane0],
        read_structures=["4B+T"],
        sample_metadata=sample_metadata,
        output=out,
        engine="numpy",
    )
    metrics = run_demux_multihost(cfg)
    # single process -> one shard; metrics must match a direct run
    direct = run_demux(
        DemuxConfig(
            inputs=[lane0],
            read_structures=["4B+T"],
            sample_metadata=sample_metadata,
            output=tmp_path / "direct",
            engine="numpy",
        )
    )
    assert [m["templates"] for m in metrics] == [
        m["templates"] for m in direct.metrics
    ]
    assert (out / "shard-0" / "Sample0000.R1.fq.gz").exists()
    assert (out / "demux-metrics.txt").exists()
    # merged metrics file identical to the direct run's
    assert (out / "demux-metrics.txt").read_text() == (
        tmp_path / "direct" / "demux-metrics.txt"
    ).read_text()


def test_multihost_counts_sum_exactly():
    """The merged-metric math: summed per-host counts reproduce the global
    DemuxMetric inputs (associativity argument from SURVEY.md §5)."""
    host_counts = [
        np.array([10, 0, 5], dtype=np.int64),
        np.array([2, 7, 1], dtype=np.int64),
        np.array([0, 0, 9], dtype=np.int64),
    ]
    total = sum(host_counts)
    acc = np.zeros(3, dtype=np.int64)
    for c in host_counts:
        acc += merge_host_counts(c)  # identity in single-process
    np.testing.assert_array_equal(acc, total)


def test_init_distributed_double_init_is_noop(monkeypatch):
    """jax's double-init error says 'should only be called once.'; the
    documented no-op contract must swallow it (and older 'already
    initialized' spellings)."""
    import jax

    from fqtk_tpu.parallel.distributed import init_distributed

    def boom(**kw):
        raise RuntimeError("distributed.initialize should only be called once.")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    init_distributed(coordinator_address="127.0.0.1:1", num_processes=1, process_id=0)

    def boom2(**kw):
        raise RuntimeError("backend already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", boom2)
    init_distributed(coordinator_address="127.0.0.1:1", num_processes=1, process_id=0)

    def boom3(**kw):
        raise RuntimeError("something else entirely")

    monkeypatch.setattr(jax.distributed, "initialize", boom3)
    with pytest.raises(RuntimeError, match="something else"):
        init_distributed(
            coordinator_address="127.0.0.1:1", num_processes=1, process_id=0
        )
