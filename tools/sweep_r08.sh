#!/bin/bash
# Round-8 decade-4 sweep (VERDICT #1/#5/#7): TimeQ sessions, sequential
# (never overlap sbt). Both decades of each pair are measured at
# SPARK_GRAFT_CPUS=16 (0.5 GB/core, default heap — the documented decade-4
# discipline), so e3 = log10(t1000/t100) compares like with like.
# NOTE: sbt prefixes forked stdout with "[info] ", so the filter must not
# anchor TIMEQ at line start (the first run of this script lost its
# stage output to exactly that).
set -x
cd /root/repo
FILTER='TIMEQ|OutOfMemory|Nonzero exit|ERROR Utils'
Q="stream_dedup_events dedup_jaccard_prefix dedup_jaccard_prefix_subset sim_semdedup_bucketed join_fuzzy_quote stream_window_distinct_subset stream_window_distinct"
SPARK_GRAFT_SF_DIR=/root/repo/target/testdata_100x SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.TimeQ $Q stream_join_click_purchase" 2>&1 | grep -E "$FILTER" | tee /tmp/sweep_100x.txt
SPARK_GRAFT_SF_DIR=/root/repo/target/testdata_band_100x SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.TimeQ join_band_balance" 2>&1 | grep -E "$FILTER" | tee /tmp/sweep_band100x.txt
SPARK_GRAFT_SF_DIR=/root/repo/target/testdata_band_1000x SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.TimeQ join_band_balance" 2>&1 | grep -E "$FILTER" | tee /tmp/sweep_band1000x.txt
SPARK_GRAFT_SF_DIR=/root/repo/target/testdata_1000x SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.TimeQ $Q" 2>&1 | grep -E "$FILTER" | tee /tmp/sweep_1000x.txt
# the stream-stream join conversion's own decade-4 proof, isolated in its
# own stage so a long run never blocks the rows above
SPARK_GRAFT_SF_DIR=/root/repo/target/testdata_1000x SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.TimeQ stream_join_click_purchase" 2>&1 | grep -E "$FILTER" | tee /tmp/sweep_1000x_join.txt
echo SWEEP_DONE
