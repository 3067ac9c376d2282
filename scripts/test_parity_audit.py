#!/usr/bin/env python3
"""Test-parity audit: every reference test has a named analog here.

The reference keeps its whole test strategy inline (~2,600 LoC of
``#[cfg(test)]`` across six files; SURVEY.md §4).  This script holds the
hand-curated map from each reference test function to the repo test(s)
that cover the same contract, and verifies both sides:

1. every mapped repo test exists in ``tests/`` (the map cannot go stale
   when tests are renamed), and
2. when the reference tree is present (``/root/reference``), every
   ``#[test]`` function in it appears in the map (a reference test added
   or newly discovered cannot be silently uncovered).

Architectural deltas are explicit: where a reference test targets an API
that intentionally does not exist here (e.g. ``ReadSet`` instance
methods — this build is batch-oriented), the entry maps to the e2e tests
that prove the same observable behavior and says so in the note.

Run: ``python scripts/test_parity_audit.py`` (wired into scripts/check.sh).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

# reference test (file.rs::fn) -> ([repo test ids], note)
REF_TO_REPO = {
    # ---- src/lib/mod.rs (encoding tables & codecs) ----
    "mod.rs::test_byte_is_no_call": (["tests/test_encoding.py::test_byte_is_no_call"], ""),
    "mod.rs::test_is_valid_iupac": (["tests/test_encoding.py::test_is_valid_iupac"], ""),
    "mod.rs::test_encode_dna_bases": (["tests/test_encoding.py::test_encode_dna_bases"], ""),
    "mod.rs::test_decode_dna_bases": (["tests/test_encoding.py::test_decode_dna_bases"], ""),
    "mod.rs::test_encode_iupac_bases": (["tests/test_encoding.py::test_encode_iupac_bases"], ""),
    "mod.rs::test_decode_iupac_bases": (["tests/test_encoding.py::test_decode_iupac_bases"], ""),
    "mod.rs::test_encode_no_calls": (["tests/test_encoding.py::test_encode_no_calls"], ""),
    "mod.rs::test_decode_no_calls": (["tests/test_encoding.py::test_decode_no_calls"], ""),
    # ---- src/lib/bitenc.rs ----
    "bitenc.rs::test_bitenc": (["tests/test_bitenc.py::test_bitenc_push_set_iter"], ""),
    "bitenc.rs::test_push_values": (["tests/test_bitenc.py::test_bitenc_push_values"], ""),
    "bitenc.rs::test_push_values_edge_cases": (
        ["tests/test_bitenc.py::test_bitenc_push_values", "tests/test_bitenc.py::test_bitenc_widths"],
        "block-boundary cases folded into the two repo tests",
    ),
    "bitenc.rs::test_issue29": (["tests/test_bitenc.py::test_bitenc_many_pushes_all_widths"], ""),
    "bitenc.rs::test_hamming": (
        [
            "tests/test_bitenc.py::test_hamming_asymmetric_iupac",
            "tests/test_bitenc.py::test_hamming_early_exit_clamp",
        ],
        "",
    ),
    # ---- src/lib/barcode_matching.rs (each runs cache on+off via rstest;
    # cache transparency here: test_matcher_cache_hits + the memo-cache
    # transparency tests in test_smallk/test_bigk) ----
    "barcode_matching.rs::test_barcode_matcher_instantiation_can_succeed": (
        ["tests/test_bitenc.py::test_matcher_assign_exact"],
        "",
    ),
    "barcode_matching.rs::test_barcode_matcher_fails_if_no_samples_provided": (
        [
            "tests/test_bitenc.py::test_matcher_empty_samples_raises",
            "tests/test_matcher.py::test_empty_samples_raises",
        ],
        "",
    ),
    "barcode_matching.rs::test_assign_exact_match": (
        ["tests/test_matcher.py::test_assign_exact_match"], ""
    ),
    "barcode_matching.rs::test_assign_imprecise_match": (
        ["tests/test_matcher.py::test_assign_imprecise_match"], ""
    ),
    "barcode_matching.rs::test_assign_precise_match_with_no_call": (
        ["tests/test_matcher.py::test_assign_precise_match_with_no_call"], ""
    ),
    "barcode_matching.rs::test_assign_imprecise_match_with_no_call": (
        ["tests/test_matcher.py::test_assign_imprecise_match_with_no_call"], ""
    ),
    "barcode_matching.rs::test_sample_no_call_doesnt_contribute_to_mismatch_number": (
        ["tests/test_matcher.py::test_sample_no_call_doesnt_contribute"], ""
    ),
    "barcode_matching.rs::test_read_no_call_contributes_to_mismatch_number": (
        ["tests/test_matcher.py::test_read_no_call_contributes"], ""
    ),
    "barcode_matching.rs::test_produce_no_match_if_too_many_mismatches": (
        ["tests/test_matcher.py::test_no_match_if_too_many_mismatches"], ""
    ),
    "barcode_matching.rs::test_produce_no_match_if_within_mismatch_delta": (
        ["tests/test_matcher.py::test_no_match_if_within_mismatch_delta"], ""
    ),
    "barcode_matching.rs::test_produce_no_match_if_too_many_mismatches_via_nocalls": (
        ["tests/test_matcher.py::test_no_match_if_too_many_nocalls"], ""
    ),
    # ---- src/lib/samples.rs ----
    "samples.rs::test_reading_from_tsv_file": (
        ["tests/test_samples.py::test_reading_from_tsv_file"], ""
    ),
    "samples.rs::test_reading_from_file_with_empty_lines_at_end": (
        ["tests/test_samples.py::test_reading_from_file_with_empty_lines_at_end"], ""
    ),
    "samples.rs::test_new_sample_non_agct_bases_in_barcode_allowed": (
        ["tests/test_samples.py::test_new_sample_non_agct_bases_in_barcode_allowed"], ""
    ),
    "samples.rs::test_tsv_file_delim_error": (
        ["tests/test_samples.py::test_tsv_file_delim_error"], ""
    ),
    "samples.rs::test_reading_from_file_with_no_header": (
        ["tests/test_samples.py::test_reading_from_file_with_no_header"], ""
    ),
    "samples.rs::test_reading_header_only_file": (
        ["tests/test_samples.py::test_reading_header_only_file"], ""
    ),
    "samples.rs::test_reading_empty_file": (
        ["tests/test_samples.py::test_reading_empty_file"], ""
    ),
    "samples.rs::test_reading_non_existent_file": (
        ["tests/test_samples.py::test_reading_non_existent_file"], ""
    ),
    "samples.rs::test_new_sample_success": (
        ["tests/test_samples.py::test_new_sample_success"], ""
    ),
    "samples.rs::test_new_sample_fail1_empty_sample_name": (
        ["tests/test_samples.py::test_new_sample_fail_empty_sample_name"], ""
    ),
    "samples.rs::test_new_sample_fail2_empty_barcode": (
        ["tests/test_samples.py::test_new_sample_fail_empty_barcode"], ""
    ),
    "samples.rs::test_from_samples_sample_group_pass1_single_sample": (
        ["tests/test_samples.py::test_from_samples_single_sample"], ""
    ),
    "samples.rs::test_from_samples_sample_group_pass2_multi_unique_samples": (
        ["tests/test_samples.py::test_from_samples_ordinals_reassigned"],
        "multi-unique group covered by the ordinal-reassignment test",
    ),
    "samples.rs::test_from_samples_sample_group_pass3_ordinal_values_will_be_changed_by_new": (
        ["tests/test_samples.py::test_from_samples_ordinals_reassigned"], ""
    ),
    "samples.rs::test_from_samples_sample_group_fail1_no_samples": (
        ["tests/test_samples.py::test_from_samples_fail_no_samples"], ""
    ),
    "samples.rs::test_from_samples_sample_group_fail2_duplicate_barcodes": (
        ["tests/test_samples.py::test_from_samples_fail_duplicate_barcodes"], ""
    ),
    "samples.rs::test_from_samples_sample_group_fail3_duplicate_sample_names": (
        ["tests/test_samples.py::test_from_samples_fail_duplicate_names"], ""
    ),
    "samples.rs::test_from_samples_sample_group_fail4_barcodes_of_different_lengths": (
        ["tests/test_samples.py::test_from_samples_fail_different_lengths"], ""
    ),
    # ---- src/bin/commands/demux.rs ----
    "demux.rs::test_different_number_of_read_structs_and_inputs_fails": (
        ["tests/test_demux_e2e.py::test_different_number_of_read_structs_and_inputs_fails"], ""
    ),
    "demux.rs::test_read_only_output_dir_fails": (
        ["tests/test_demux_e2e.py::test_read_only_output_dir_fails"], ""
    ),
    "demux.rs::test_inputs_doesnt_exist_fails": (
        ["tests/test_demux_e2e.py::test_inputs_doesnt_exist_fails"], ""
    ),
    "demux.rs::test_too_few_threads_fails": (
        ["tests/test_demux_e2e.py::test_too_few_threads_fails"], ""
    ),
    "demux.rs::test_demux_fragment_reads": (
        ["tests/test_demux_e2e.py::test_demux_fragment_reads"], ""
    ),
    "demux.rs::test_output_type_reads": (
        ["tests/test_demux_e2e.py::test_output_type_reads"], ""
    ),
    "demux.rs::test_demux_with_catchall_barcode": (
        ["tests/test_demux_e2e.py::test_demux_with_catchall_barcode"], ""
    ),
    "demux.rs::test_demux_with_iupac_bases_in_barcode": (
        ["tests/test_demux_e2e.py::test_demux_with_iupac_bases_in_barcode"], ""
    ),
    "demux.rs::test_demux_with_ns_in_barcode": (
        ["tests/test_demux_e2e.py::test_demux_with_ns_in_barcode"], ""
    ),
    "demux.rs::test_demux_paired_reads_with_in_line_sample_barcodes": (
        ["tests/test_demux_e2e.py::test_demux_paired_reads_with_in_line_sample_barcodes"], ""
    ),
    "demux.rs::test_demux_dual_indexed_paired_end_reads": (
        ["tests/test_demux_e2e.py::test_demux_dual_indexed_paired_end_reads"], ""
    ),
    "demux.rs::test_demux_a_wierd_set_of_reads": (
        ["tests/test_demux_e2e.py::test_demux_a_wierd_set_of_reads"], ""
    ),
    "demux.rs::test_demux_a_read_structure_with_multiple_templates_in_one_read": (
        ["tests/test_demux_e2e.py::test_demux_multiple_templates_in_one_read"], ""
    ),
    "demux.rs::test_fails_if_zero_read_structures_have_template_bases": (
        ["tests/test_demux_e2e.py::test_no_output_types_fails"],
        "same 'No output types requested' panic contract",
    ),
    "demux.rs::test_fails_if_not_enough_fastq_records_are_passed": (
        [
            "tests/test_demux_e2e.py::test_out_of_sync_lists_present_headers",
            "tests/test_demux_e2e.py::test_staggered_eof_error_cites_own_structure",
        ],
        "",
    ),
    "demux.rs::test_fails_if_too_many_fastq_records_are_passed": (
        ["tests/test_demux_e2e.py::test_out_of_sync_lists_present_headers"],
        "both directions of file-length mismatch",
    ),
    "demux.rs::test_fails_if_reads_too_short": (
        ["tests/test_demux_e2e.py::test_fails_if_reads_too_short"], ""
    ),
    "demux.rs::test_skip_reads_too_short": (
        ["tests/test_demux_e2e.py::test_skip_reads_too_short"], ""
    ),
    "demux.rs::test_write_header_standard_no_umi": (
        ["tests/test_headers.py::test_standard_no_umi"], ""
    ),
    "demux.rs::test_write_header_standard_with_umi": (
        ["tests/test_headers.py::test_standard_with_umi"], ""
    ),
    "demux.rs::test_write_header_append_barcode_and_umi": (
        ["tests/test_headers.py::test_append_barcode_and_umi"], ""
    ),
    "demux.rs::test_write_header_short_name_no_comment": (
        ["tests/test_headers.py::test_short_name_no_comment"], ""
    ),
    "demux.rs::test_write_header_name_too_many_parts": (
        ["tests/test_headers.py::test_name_too_many_parts"], ""
    ),
    "demux.rs::test_write_header_comment_too_few_parts": (
        ["tests/test_headers.py::test_comment_too_few_parts"], ""
    ),
    "demux.rs::test_sample_barcode_sequence": (
        ["tests/test_demux_e2e.py::test_demux_dual_indexed_paired_end_reads"],
        "ReadSet is batch-native here; cross-input barcode concat proven e2e "
        "(headers carry the full joined barcode)",
    ),
    "demux.rs::test_cellular_barcode_segments": (
        [
            "tests/test_read_structure.py::test_segments_by_type",
            "tests/test_demux_e2e.py::test_output_type_reads",
        ],
        "typed segment iteration: parser-level + routed-output e2e",
    ),
    "demux.rs::test_template_segments": (
        [
            "tests/test_read_structure.py::test_segments_by_type",
            "tests/test_demux_e2e.py::test_output_type_reads",
        ],
        "",
    ),
    "demux.rs::test_sample_barcode_segments": (
        [
            "tests/test_read_structure.py::test_segments_by_type",
            "tests/test_demux_e2e.py::test_output_type_reads",
        ],
        "",
    ),
    "demux.rs::test_molecular_barcode_segments": (
        [
            "tests/test_read_structure.py::test_segments_by_type",
            "tests/test_demux_e2e.py::test_output_type_reads",
        ],
        "",
    ),
    "demux.rs::test_combine_readsets": (
        ["tests/test_demux_e2e.py::test_demux_a_wierd_set_of_reads"],
        "multi-input segment merge proven by the 4-structure e2e scenario",
    ),
    "demux.rs::test_combine_readsets_fails_on_empty_vector": (
        ["tests/test_demux_e2e.py::test_all_skip_batch_window_does_not_truncate"],
        "no ReadSet-vector API in the batch design; the empty-window edge is "
        "the analogous boundary",
    ),
    "demux.rs::validate_inputs_can_succeed": (
        ["tests/test_demux_e2e.py::test_validate_inputs_can_succeed"], ""
    ),
    # ---- src/bin/commands/subsample.rs ----
    "subsample.rs::test_base_read_name_plain": (
        ["tests/test_subsample.py::test_base_read_name"], ""
    ),
    "subsample.rs::test_base_read_name_with_slash_1": (
        ["tests/test_subsample.py::test_base_read_name"], ""
    ),
    "subsample.rs::test_base_read_name_with_slash_2": (
        ["tests/test_subsample.py::test_base_read_name"], ""
    ),
    "subsample.rs::test_base_read_name_with_comment": (
        ["tests/test_subsample.py::test_base_read_name"], ""
    ),
    "subsample.rs::test_base_read_name_with_suffix_and_comment": (
        ["tests/test_subsample.py::test_base_read_name"], ""
    ),
    "subsample.rs::test_base_read_name_with_tab_comment": (
        ["tests/test_subsample.py::test_base_read_name"], ""
    ),
    "subsample.rs::test_base_read_name_slash_3_not_stripped": (
        ["tests/test_subsample.py::test_base_read_name"], ""
    ),
    "subsample.rs::test_validation_missing_input": (
        ["tests/test_subsample.py::test_validation_errors_collected"], ""
    ),
    "subsample.rs::test_validation_bad_fraction_negative": (
        ["tests/test_subsample.py::test_validation_errors_collected"], ""
    ),
    "subsample.rs::test_validation_bad_fraction_over_one": (
        ["tests/test_subsample.py::test_validation_errors_collected"], ""
    ),
    "subsample.rs::test_validation_insufficient_threads": (
        ["tests/test_subsample.py::test_validation_errors_collected"], ""
    ),
    "subsample.rs::test_validation_bad_compression_level": (
        ["tests/test_subsample.py::test_validation_errors_collected"], ""
    ),
    "subsample.rs::test_single_end": (
        ["tests/test_subsample.py::test_subsample_deterministic_with_seed"], ""
    ),
    "subsample.rs::test_paired_end": (
        ["tests/test_subsample.py::test_subsample_paired_lockstep"], ""
    ),
    "subsample.rs::test_three_inputs": (
        ["tests/test_fuzz_differential.py::test_subsample_native_matches_python_fuzz"],
        "fuzz scenarios run 1-4 lockstep inputs",
    ),
    "subsample.rs::test_seed_reproducibility": (
        ["tests/test_subsample.py::test_subsample_deterministic_with_seed"], ""
    ),
    "subsample.rs::test_deterministic_without_seed": (
        ["tests/test_subsample.py::test_subsample_deterministic_without_seed"], ""
    ),
    "subsample.rs::test_different_params_different_output": (
        ["tests/test_siphash.py::test_effective_seed_field_sensitivity"], ""
    ),
    "subsample.rs::test_fraction_zero": (
        ["tests/test_subsample.py::test_subsample_none"], ""
    ),
    "subsample.rs::test_fraction_one": (
        ["tests/test_subsample.py::test_subsample_all"], ""
    ),
    "subsample.rs::test_empty_input": (
        ["tests/test_subsample.py::test_subsample_empty_input"], ""
    ),
    "subsample.rs::test_read_name_check_passes": (
        ["tests/test_subsample.py::test_subsample_paired_lockstep"],
        "in-sync names with checking enabled (the default)",
    ),
    "subsample.rs::test_read_name_check_fails": (
        ["tests/test_subsample.py::test_subsample_name_mismatch_fails"], ""
    ),
    "subsample.rs::test_read_name_check_disabled": (
        ["tests/test_subsample.py::test_subsample_name_mismatch_ok_when_disabled"], ""
    ),
}


def repo_test_ids() -> set:
    ids = set()
    pat = re.compile(r"^\s*def (test_\w+)", re.M)
    for f in sorted((REPO / "tests").glob("test_*.py")):
        for m in pat.finditer(f.read_text()):
            ids.add(f"tests/{f.name}::{m.group(1)}")
    return ids


def reference_test_ids() -> set:
    """All #[test] fns in the reference tree (also catches rstest cases)."""
    ids = set()
    fn_pat = re.compile(r"fn ((?:test_|should_|validate_)\w+)\s*\(")
    for f in list(REFERENCE.glob("src/lib/*.rs")) + list(
        REFERENCE.glob("src/bin/commands/*.rs")
    ):
        text = f.read_text()
        # only test functions: those declared after the tests module starts
        tests_start = text.find("#[cfg(test)]")
        if tests_start == -1:
            continue
        for m in fn_pat.finditer(text[tests_start:]):
            ids.add(f"{f.name}::{m.group(1)}")
    return ids


def main() -> int:
    failures = []
    have = repo_test_ids()
    for ref, (repo_tests, _note) in REF_TO_REPO.items():
        for t in repo_tests:
            if t not in have:
                failures.append(f"mapped repo test missing: {ref} -> {t}")
    if REFERENCE.is_dir():
        refs = reference_test_ids()
        unmapped = refs - set(REF_TO_REPO)
        for r in sorted(unmapped):
            failures.append(f"reference test not in parity map: {r}")
        extra = set(REF_TO_REPO) - refs
        for r in sorted(extra):
            failures.append(f"parity map names a nonexistent reference test: {r}")
        ref_note = f"{len(refs)} reference tests"
    else:
        ref_note = "reference tree absent; repo-side check only"
    for f in failures:
        print(f"FAIL {f}")
    print(
        f"test-parity audit: {len(REF_TO_REPO)} mapped ({ref_note}), "
        f"{len(failures)} failures"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
