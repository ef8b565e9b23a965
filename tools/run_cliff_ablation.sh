#!/bin/bash
# Localize the headline's >256 chunk cliff per stage (docs/NEXT.md lead 1).
# Runs tools/profile_headline_stages.py once per (variant, chunk) in its own
# subprocess (remote backend isolation), with the persistent compile cache.
# Usage: bash tools/run_cliff_ablation.sh [SECONDS] >> /tmp/cliff.log
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
SECONDS_ARG="${1:-150}"
for chunk in 512 256; do
  for v in full no_fwd_fft no_inv_fft no_remap no_cumsum no_polar no_ola; do
    echo "=== variant=$v chunk=$chunk $(date +%H:%M:%S)"
    timeout 900 python tools/profile_headline_stages.py "$v" "$SECONDS_ARG" "$chunk" 2>&1 | tail -2
  done
done
echo "=== ablation batch done $(date +%H:%M:%S)"
