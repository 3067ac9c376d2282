"""SipHash-1-3 / Rust DefaultHasher seed-derivation tests.

The SipHash core is golden-tested against CPython's own independent
siphash13 implementation: CPython >= 3.11 hashes ``bytes`` with siphash13
(``sys.hash_info.algorithm``), and with ``PYTHONHASHSEED=0`` its key is
zero, matching ``DefaultHasher::new()``'s ``SipHasher13::new_with_keys(0,
0)``.  The Rust ``Hash``-encoding layer (field order, length prefixes,
``Path`` component hashing) mirrors the std sources; its semantic quirks
are asserted directly.
"""

import subprocess
import sys

from fqtk_tpu.utils.siphash import (
    RustDefaultHasher,
    hash_path,
    siphash13,
    subsample_effective_seed,
)


def _cpython_siphash13(data: bytes) -> int:
    """hash(bytes) under PYTHONHASHSEED=0 == siphash13 with zero key
    (signed; -1 is remapped to -2 by CPython, avoided in test inputs)."""
    out = subprocess.run(
        [sys.executable, "-c", "import sys; print(hash(sys.stdin.buffer.read()))"],
        input=data,
        capture_output=True,
        env={"PYTHONHASHSEED": "0", "PATH": "/usr/bin:/bin"},
        check=True,
    )
    return int(out.stdout.strip()) & ((1 << 64) - 1)


def test_siphash13_core_matches_cpython():
    assert sys.hash_info.algorithm == "siphash13"
    cases = [
        b"a",
        b"ab",
        b"hello world",
        b"0123456",  # 7 bytes (tail only)
        b"01234567",  # exactly one block
        b"012345678",  # block + 1
        bytes(range(16)),
        bytes(range(17)),
        b"x" * 64,
        b"/tmp/some/path.fq.gz",
        bytes([0xFF] * 23),
    ]
    for data in cases:
        assert siphash13(data) == _cpython_siphash13(data), data


def test_siphash13_known_relations():
    # sanity: avalanche — one flipped bit changes the hash
    a = siphash13(b"seed-material")
    b = siphash13(b"seed-materiam")
    assert a != b
    # empty input is well-defined (finalization only)
    assert siphash13(b"") == siphash13(b"")


def test_hasher_integer_encodings():
    # write_u64 == write of the 8 LE bytes (Rust short_write semantics)
    h1 = RustDefaultHasher()
    h1.write_u64(0x0123456789ABCDEF)
    h2 = RustDefaultHasher()
    h2.write(bytes.fromhex("efcdab8967452301"))
    assert h1.finish() == h2.finish()


def test_path_hash_normalization_quirks():
    """Path::hash skips separators and '.' components following a separator
    (Rust std path.rs), so these spellings collide by design."""

    def ph(p):
        h = RustDefaultHasher()
        hash_path(h, p)
        return h.finish()

    assert ph("a/b") == ph("a//b")  # duplicate separators collapse
    assert ph("a/b") == ph("a/./b")  # '.' after separator skipped
    assert ph("a/b") == ph("a/b/")  # trailing separator dropped
    assert ph("a/b") != ph("a/c")
    # component writes concatenate in the SipHash stream, so "ab" and "a/b"
    # collide — a (known) property of Rust's Path::hash we must reproduce
    assert ph("ab") == ph("a/b")
    assert ph("abc") != ph("ab")


def test_effective_seed_field_sensitivity():
    base = dict(
        inputs=["r1.fq.gz", "r2.fq.gz"],
        output="out",
        fraction=0.5,
        threads=8,
        compression_level=5,
        seed=None,
        disable_read_name_checking=False,
    )
    s0 = subsample_effective_seed(**base)
    assert s0 == subsample_effective_seed(**base)  # deterministic
    for field, val in [
        ("inputs", ["r1.fq.gz"]),
        ("output", "out2"),
        ("fraction", 0.25),
        ("threads", 9),
        ("compression_level", 6),
        ("disable_read_name_checking", True),
    ]:
        mod = dict(base, **{field: val})
        assert subsample_effective_seed(**mod) != s0, field


def test_effective_seed_option_discriminant():
    base = dict(
        inputs=["a"],
        output="o",
        fraction=0.1,
        threads=2,
        compression_level=1,
        disable_read_name_checking=False,
    )
    none = subsample_effective_seed(seed=None, **base)
    some0 = subsample_effective_seed(seed=0, **base)
    assert none != some0  # Some(0) hashes discriminant 1 + payload


def test_runtime_uses_defaulthasher_derivation(tmp_path):
    from fqtk_tpu.runtime.subsample import SubsampleConfig, effective_seed

    cfg = SubsampleConfig(
        inputs=[tmp_path / "a.fq"],
        output=tmp_path / "out",
        fraction=0.5,
    )
    expected = subsample_effective_seed(
        inputs=[str(tmp_path / "a.fq")],
        output=str(tmp_path / "out"),
        fraction=0.5,
        threads=8,
        compression_level=5,
        seed=None,
        disable_read_name_checking=False,
    )
    assert effective_seed(cfg) == expected
