"""fqtk-tpu: a TPU-native FASTQ toolkit.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``fulcrumgenomics/fqtk`` (sample demultiplexing and subsampling of FASTQ
files): batched IUPAC one-hot barcode matching on the MXU, data-parallel
streaming over device meshes, and native host I/O.

Layers (see SURVEY.md §1):

- ``fqtk_tpu.core``     — pure host logic: encoding tables, read structures,
                          sample metadata, header rewriting.
- ``fqtk_tpu.ops``      — device compute: batched mismatch counting + top-2
                          assignment (XLA einsum path and Pallas kernel).
- ``fqtk_tpu.parallel`` — mesh/sharding: data-parallel reads, K-sharded
                          whitelists, collective metric merges.
- ``fqtk_tpu.io``       — FASTQ parsing and BGZF writing (Python fallback +
                          native C++ engine).
- ``fqtk_tpu.runtime``  — the demux/subsample pipeline orchestrators.
- ``fqtk_tpu.cli``      — flag-compatible command line.
"""

__version__ = "0.1.0"
