#!/bin/bash
# Full ScalaTest run + machine-parsed counts. COVERAGE.md's test-count
# line comes from THIS output (r16 verdict trivia: keep the count
# maintained by a script, not prose). Run from /root/repo on a host
# with nothing else on it (the suite includes timing-sensitive specs).
set -o pipefail
sbt -batch test 2>&1 | tee /tmp/sbt_test_full.log | tail -60 \
  | grep -E "Total number of tests run:|Suites: completed|Tests: succeeded|TESTS FAILED|All tests passed"
