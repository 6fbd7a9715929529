#!/bin/bash
# Run a repo script from a frozen snapshot so live edits to /root/repo cannot
# leak into a long-running TPU job through lazy imports (round 5 lesson: a
# mid-run edit crashed a 400 s bench compile with a mixed-version import).
#   usage: scripts/run_from_snapshot.sh <script-and-args...>
set -e
SNAP=/tmp/acmmp_snap_$(git rev-parse --short HEAD)
if [ ! -d "$SNAP" ]; then
  mkdir -p "$SNAP"
  (cd /root/repo && git archive HEAD) | tar -x -C "$SNAP"
fi
cd "$SNAP"
exec python "$@"
