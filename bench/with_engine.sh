#!/bin/bash
# Serialize heavy interactive work against the scaling hunt: claim the
# busy lock (hunt won't start a new pair), wait for any in-flight pair
# to finish, run the command, release. Usage: bench/with_engine.sh cmd...
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
BUSY="$REPO/bench/.engine_busy"
PAIR="$REPO/bench/.hunt_pair_running"
touch "$BUSY"
# EXIT alone doesn't fire on an untrapped fatal signal in bash: name
# TERM/INT/HUP too, or a killed wrapper leaves a stale busy lock that
# starves the hunt forever
trap 'rm -f "$BUSY"' EXIT TERM INT HUP
while [ -e "$PAIR" ]; do sleep 10; done
"$@"
