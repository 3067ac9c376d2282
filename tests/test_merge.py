"""Multi-host output merge (`concat_shards` / `fqtk-tpu concat-shards`).

The merged per-sample files must be valid BGZF whose decompressed bytes
equal a single-process demux over the concatenated inputs — the realized
form of the shard-concatenation contract tested in test_multiprocess.py.
"""

import gzip
from pathlib import Path

import pytest

from fqtk_tpu.io.fastq import _BGZF_EOF
from fqtk_tpu.parallel.merge import MergeError, concat_shards
from fqtk_tpu.runtime.demux import DemuxConfig, run_demux

META = "sample_id\tbarcode\nsA\tGATTACA\nsB\tCCCCAAA\n"


def _fq(path: Path, bcs):
    lines = []
    for i, bc in enumerate(bcs):
        lines += [f"@{path.stem}_{i} 1:N:0:0", bc + "GGGGG", "+", ";" * (len(bc) + 5)]
    path.write_text("\n".join(lines) + "\n")


def _demux(inputs, meta, out, **kw):
    return run_demux(
        DemuxConfig(
            inputs=list(inputs),
            read_structures=["7B+T"],
            sample_metadata=meta,
            output=out,
            engine="numpy",
            batch_size=4,
            **kw,
        )
    )


@pytest.fixture()
def sharded_out(tmp_path):
    """Two demux runs into shard-0/shard-1 + the equivalent single run."""
    meta = tmp_path / "metadata.tsv"
    meta.write_text(META)
    shard0 = ["GATTACA", "CCCCAAA", "GATTACA", "TTTTTTT", "GATTACA"]
    shard1 = ["CCCCAAA", "GATTACA", "AAAAAAA"]
    _fq(tmp_path / "in0.fastq", shard0)
    _fq(tmp_path / "in1.fastq", shard1)
    out = tmp_path / "out"
    for p in range(2):
        _demux([tmp_path / f"in{p}.fastq"], meta, out / f"shard-{p}")
    combined = tmp_path / "combined.fastq"
    combined.write_text(
        (tmp_path / "in0.fastq").read_text() + (tmp_path / "in1.fastq").read_text()
    )
    _demux([combined], meta, tmp_path / "single")
    return tmp_path, out


NAMES = ("sA.R1.fq.gz", "sB.R1.fq.gz", "unmatched.R1.fq.gz")


def test_concat_shards_matches_single_process(sharded_out):
    tmp, out = sharded_out
    merged = concat_shards(out)
    assert sorted(p.name for p in merged) == sorted(NAMES)
    for name in NAMES:
        got = gzip.decompress((out / name).read_bytes())
        want = gzip.decompress((tmp / "single" / name).read_bytes())
        assert got == want, name
        # valid BGZF: exactly one EOF block, at the very end
        raw = (out / name).read_bytes()
        assert raw.endswith(_BGZF_EOF)
        assert not raw[: -len(_BGZF_EOF)].endswith(_BGZF_EOF)
    # shards kept by default
    assert (out / "shard-0").is_dir() and (out / "shard-1").is_dir()


def test_concat_shards_readable_by_product_reader(sharded_out):
    from fqtk_tpu.io.fastq import FastqReader, open_reader

    tmp, out = sharded_out
    concat_shards(out)
    n_merged = sum(1 for _ in FastqReader(open_reader(out / "sA.R1.fq.gz")))
    n_single = sum(
        1 for _ in FastqReader(open_reader(tmp / "single" / "sA.R1.fq.gz"))
    )
    assert n_merged == n_single == 4


def test_concat_shards_remove_shards(sharded_out):
    _, out = sharded_out
    concat_shards(out, remove_shards=True)
    assert not (out / "shard-0").exists()
    assert not (out / "shard-1").exists()
    assert (out / "sA.R1.fq.gz").exists()


def test_concat_shards_small_buffer_streaming(sharded_out):
    """Tiny buffer forces the streaming loop + tail-split handling."""
    tmp, out = sharded_out
    concat_shards(out, buffer_bytes=70)
    for name in NAMES:
        got = gzip.decompress((out / name).read_bytes())
        want = gzip.decompress((tmp / "single" / name).read_bytes())
        assert got == want, name


def test_concat_shards_cli(sharded_out):
    from fqtk_tpu.cli import main as cli_main

    tmp, out = sharded_out
    assert cli_main(["concat-shards", "-o", str(out), "--remove-shards"]) == 0
    assert not (out / "shard-0").exists()
    got = gzip.decompress((out / "sA.R1.fq.gz").read_bytes())
    want = gzip.decompress((tmp / "single" / "sA.R1.fq.gz").read_bytes())
    assert got == want


def test_concat_shards_errors(tmp_path):
    with pytest.raises(MergeError, match="No shard-N directories"):
        concat_shards(tmp_path)
    # non-contiguous pids
    (tmp_path / "shard-0").mkdir()
    (tmp_path / "shard-2").mkdir()
    with pytest.raises(MergeError, match="not contiguous"):
        concat_shards(tmp_path)
    (tmp_path / "shard-2").rename(tmp_path / "shard-1")
    with pytest.raises(MergeError, match="No .fq.gz outputs"):
        concat_shards(tmp_path)
    # mismatched per-shard file sets: refuse to merge a partial view
    (tmp_path / "shard-0" / "sA.R1.fq.gz").write_bytes(_BGZF_EOF)
    with pytest.raises(MergeError, match="output set differs"):
        concat_shards(tmp_path)
