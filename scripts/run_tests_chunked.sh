#!/bin/bash
# Full-suite runner in sequential chunks (each well under typical bg
# timeouts when invoked per-chunk). Usage: run_tests_chunked.sh <chunk#>
cd "$(dirname "$0")/.." || exit 1
case "$1" in
  1) FILES="tests/test_advice_r11.py tests/test_advice_r12.py tests/test_advice_r13.py tests/test_advice_r14.py tests/test_advice_r15.py tests/test_advice_r16.py tests/test_copy.py tests/test_corr_range.py tests/test_cow.py";;
  2) FILES="tests/test_datapipe.py tests/test_datemath_boundary.py tests/test_dialect.py tests/test_differential.py tests/test_esgen.py tests/test_explain_analyze.py";;
  3) FILES="tests/test_engine.py tests/test_engine_more.py tests/test_expressions.py tests/test_join_reorder.py tests/test_lateral_subquery.py tests/test_lateral_values.py tests/test_layout_cdf.py tests/test_lsh_budget.py";;
  4) FILES="tests/test_matview.py";;
  5) FILES="tests/test_matview_fuzz.py tests/test_matview_r14.py";;
  6) FILES="tests/test_matview_shared_refresh.py tests/test_matview_window_filter.py tests/test_merge_fuzz.py tests/test_merge_into.py tests/test_merge_sink.py tests/test_ntz_time.py tests/test_occ.py tests/test_occ_multiprocess.py";;
  7) FILES="tests/test_parsers.py tests/test_partitioned_sink.py tests/test_prepare_cache.py tests/test_pyeval_parity.py tests/test_quantified.py tests/test_regexp_replace.py tests/test_scale_layout.py tests/test_semantics_shims.py tests/test_session_udaf.py tests/test_sessions.py";;
  8) FILES="tests/test_sketches_plans.py tests/test_skipping.py tests/test_source_planner.py tests/test_sources_builtins.py tests/test_storage_chaos.py tests/test_stream_changes.py tests/test_streaming_vm.py tests/test_tz_stability.py tests/test_uaparse.py tests/test_window_setops.py";;
  *) echo "chunk 1-8 required"; exit 2;;
esac
exec python -m pytest $FILES -q
