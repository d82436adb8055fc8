#!/bin/bash
# Persist the JAX compilation cache across rounds.  The build host resets
# between sessions, and every large program costs ~20 min on the remote
# compile tunnel (measured round 3: flagship train_iteration = 24 min cold,
# 17.6 MB cached).  Committing the cache turns every next-round compile of an
# unchanged program into a disk hit (keys cover jaxlib version + backend +
# program hash, so a changed program or image simply misses — harmless).
#
#   tools/warm_cache.sh save      # /root/.cache/jax_comp -> tools/warm_cache/
#   tools/warm_cache.sh restore   # tools/warm_cache/ -> /root/.cache/jax_comp
set -eu
REPO=$(cd "$(dirname "$0")/.." && pwd)
CACHE=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp}
STORE="$REPO/tools/warm_cache"
case "${1:?save|restore}" in
  save)
    # Delete-then-copy: cache keys embed jaxlib version + backend, so
    # entries from an older image can never hit again — accumulating them
    # would bloat every future clone permanently.  The fresh save holds
    # exactly the programs this session compiled or re-hit (restore copies
    # the old store into the live cache first, so still-valid entries
    # survive the rewrite via their mtime-preserved copies).
    rm -rf "$STORE"
    mkdir -p "$STORE"
    # Keep only substantial programs (init-time throwaways are < 1 MB and
    # recompile in seconds on the host).
    find "$CACHE" -maxdepth 1 -type f -size +1M -exec cp -f {} "$STORE/" \;
    du -sh "$STORE"
    ;;
  restore)
    mkdir -p "$CACHE"
    cp -f "$STORE"/* "$CACHE/" 2>/dev/null || true
    ls "$CACHE" | wc -l
    ;;
esac
