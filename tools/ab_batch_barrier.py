"""A/B the batch submit barrier depth in ONE process, interleaved.

The relay's speed drifts on ~minutes timescales, so two separate probe
processes cannot attribute a per-frame delta to a code change. This runs
measure_batched(1080p, B=16) alternating the SMH_BATCH_BARRIER knob
A/B/A/B within one process (shared jit cache, same phase window) and
prints per-round and pooled medians.

Usage: python tools/ab_batch_barrier.py [rounds_per_config] [batches]
"""

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    out: dict = {"lazy_ms": [], "eager_ms": []}
    for r in range(rounds):
        for mode, key in (("", "lazy_ms"), ("eager", "eager_ms")):
            if mode:
                os.environ["SMH_BATCH_BARRIER"] = mode
            else:
                os.environ.pop("SMH_BATCH_BARRIER", None)
            ms, stats = bench.measure_batched(1920, 1080, iters, batch=16)
            out[key].append(round(ms, 2))
            print(
                f"round {r} {key}: {ms:.2f} ms/frame  "
                f"poke={stats.get('t_poke_ms', 0):.0f}ms "
                f"pack={stats.get('t_pack_ms', 0):.0f}ms "
                f"fetch={stats.get('t_fetch_ms', 0):.0f}ms "
                f"lat={stats.get('lat_ms')}",
                file=sys.stderr,
                flush=True,
            )
    out["lazy_pooled_ms"] = round(statistics.median(out["lazy_ms"]), 2)
    out["eager_pooled_ms"] = round(statistics.median(out["eager_ms"]), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
