# Shared helpers for the round-5 TPU queues. The axon tunnel wedges
# intermittently (r5: one probe succeeded, the very next wedged), so the
# health gate WAITS (probe + cool-down loop) instead of aborting, and
# stages retry once after re-waiting.

health_wait() {
  # probe until the tunnel answers, up to ~50 min (15 x (90 s probe +
  # 120 s cool-down)). Returns 1 only if every probe wedged.
  local tries=${1:-15}
  for i in $(seq 1 "$tries"); do
    if timeout 90 python -c \
      "import jax.numpy as jnp; jnp.ones(4).sum().block_until_ready(); print('tunnel ok')"; then
      return 0
    fi
    echo "health_wait: probe $i/$tries wedged: $(date -u +%H:%M:%S)"
    sleep 120
  done
  return 1
}

run_stage() {
  # run_stage <name> <log> <cmd...>: health-gate, run, on failure re-gate
  # and retry ONCE (compiles are cached — retries are cheap).
  local name=$1 log=$2; shift 2
  for attempt in 1 2; do
    echo "=== stage $name attempt $attempt: $(date -u +%H:%M:%S) ==="
    health_wait || { echo "stage $name: tunnel never answered"; return 1; }
    "$@" 2>&1 | tee "$log"
    local rc=${PIPESTATUS[0]}
    echo "=== stage $name attempt $attempt done rc=$rc ==="
    [ "$rc" -eq 0 ] && return 0
  done
  return 1
}
