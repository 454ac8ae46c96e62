#!/usr/bin/env bash
# Block until the remote-TPU tunnel accepts a backend init + tiny device
# execution, then exit 0.  Used to arm work that must start the moment the
# tunnel recovers from an outage (round 3 lost the whole 19x19 run to one).
#
# Each probe is bounded: the round-3 failure mode includes a client that
# HANGS in backend init instead of erroring, so a plain `jax.devices()`
# can block forever.  `timeout` kills the exact probe process only.
#
# Usage: scripts/tpu_wait.sh [poll_seconds]   (default 120)
set -u
POLL=${1:-120}
cd "$(dirname "$0")/.."
N=0
while true; do
  N=$((N + 1))
  if timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
EOF
  then
    echo "tpu alive after $N probes $(date -u +%FT%TZ)"
    exit 0
  fi
  sleep "$POLL"
done
