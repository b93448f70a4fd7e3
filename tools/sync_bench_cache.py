"""Sync freshly-compiled XLA cache entries into the committed seeds.

The driver's bench window (~1650 s) cannot absorb cold compiles
(~2-4 min per program through the axon relay — docs/DESIGN.md), so the
repo commits two seed caches that the harness copies into the active
cache dirs at startup:

- ``bench_cache/``  <- /tmp/jax_cache      (TPU programs, bench stages;
  seeded by ``bench._seed_cache``)
- ``dryrun_cache/`` <- /tmp/jax_cache_cpu  (CPU-mesh programs, the
  driver's ``dryrun_multichip``; seeded by
  ``__graft_entry__._setup_cpu_cache``)

Build-round workflow: run every bench stage child and the dryrun once
on this image (warming the live caches), then ``python
tools/sync_bench_cache.py`` and commit the new files. Stale entries
from older jax/runtime versions are never read (the cache key includes
the compiler fingerprint); prune with --prune-unused after a version
bump by checking file atimes is NOT reliable here — just delete the
seed dir and re-warm instead.
"""

import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

# Size cap for committed TPU entries: the full live cache is ~0.5 GB
# (the 1080p/4K stream mega-programs are 10-20 MB each) — too heavy for
# git. Small per-op entries (the hidden warm-stage cost: dozens of
# ~0.5 s eager-glue compiles per child) are committed; the big stream
# programs rely on the live /tmp cache persisting to the driver's
# end-of-round bench on the same host (held true in r4: warmed stages
# landed, unwarmed stages timed out).
PAIRS = [
    (pathlib.Path("/tmp/jax_cache"), REPO / "bench_cache", 1 << 20),
    (pathlib.Path("/tmp/jax_cache_cpu"), REPO / "dryrun_cache", None),
]


def sync(live: pathlib.Path, seed: pathlib.Path, max_bytes) -> int:
    if not live.is_dir():
        print(f"{live}: absent, skipped")
        return 0
    seed.mkdir(exist_ok=True)
    n = skipped_big = 0
    for f in sorted(live.iterdir()):
        if not f.is_file() or f.name.startswith(".") or ".tmp" in f.name:
            continue
        if max_bytes is not None and f.stat().st_size > max_bytes:
            skipped_big += 1
            continue
        dst = seed / f.name
        if not dst.exists():
            shutil.copyfile(f, dst)
            n += 1
    print(f"{live} -> {seed}: +{n} new entries "
          f"({sum(1 for _ in seed.iterdir())} total; "
          f"{skipped_big} over the size cap rely on the live cache)")
    return n


if __name__ == "__main__":
    total = sum(sync(live, seed, cap) for live, seed, cap in PAIRS)
    sys.exit(0 if total >= 0 else 1)
