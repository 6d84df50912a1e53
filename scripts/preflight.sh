#!/bin/sh
# Pre-snapshot invariant: the tree MUST compile (main + test) before any
# end-of-round or milestone commit. Round 12's gate evidence was voided by
# a single uncompiled commit; this script is the guard. Run it (and say so
# in the commit message) before every snapshot commit:
#
#   scripts/preflight.sh && git commit ...
#
# Exit nonzero on any compile error.
set -e
cd "$(dirname "$0")/.."
sbt -batch compile Test/compile
echo "preflight OK: main + test compile green"
