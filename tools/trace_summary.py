#!/usr/bin/env python
"""Summarize a captured trace (docs/artifacts/trace_r4) per die/* substep.

Parses the TensorBoard xplane protobuf (via tensorflow's bundled schema)
and aggregates XLA-op event durations grouped by the ``die/<substep>``
named scope attached by core/env.py (utils/profiling.named_scope) — the
textual twin of the TensorBoard trace-viewer grouping.

Usage: python tools/trace_summary.py [trace_dir]
"""
import glob
import sys
from collections import defaultdict


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "docs/artifacts/trace_r4"
    paths = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    if not paths:
        sys.exit(f"no .xplane.pb under {root}")

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    tot = defaultdict(int)
    cnt = defaultdict(int)
    other = 0
    for plane in space.planes:
        if not plane.name.startswith("/device:"):
            continue
        smeta = {k: v.name for k, v in plane.stat_metadata.items()}
        # the jax named_scope path rides the per-op `tf_op` stat on the
        # "XLA Ops" device line (…/die/<substep>/<op>)
        scope_of = {}
        for m_id, m in plane.event_metadata.items():
            probe = m.name
            for s in m.stats:
                if smeta.get(s.metadata_id) == "tf_op":
                    probe = s.str_value or probe
            if "die/" in probe:
                scope = probe.split("die/", 1)[1]
                scope_of[m_id] = "die/" + scope.split("/", 1)[0]
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                scope = scope_of.get(ev.metadata_id)
                if scope:
                    tot[scope] += ev.duration_ps
                    cnt[scope] += 1
                else:
                    other += ev.duration_ps

    if not tot:
        sys.exit("no die/* scoped events found")
    print(f"{'scope':24s} {'total_us':>12s} {'events':>8s}")
    for k in sorted(tot, key=tot.get, reverse=True):
        print(f"{k:24s} {tot[k] / 1e6:12.1f} {cnt[k]:8d}")
    print(f"{'(other device ops)':24s} {other / 1e6:12.1f}")


if __name__ == "__main__":
    main()
