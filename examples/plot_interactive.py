"""Live interactive viewing — twin of examples/plot_interactive.py: open the
2x2 plotter window and watch a simulation run (requires a display; use
--record to write a GIF headlessly instead)."""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="fast", choices=["exact", "fast"])
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--record", default=None,
                    help="write a GIF instead of opening a window")
    args = ap.parse_args()

    if args.record:
        from examples.record_animation import record, record_fast

        fn = record_fast if args.engine == "fast" else record
        fn(args.record, (args.size, args.size), num_frames=args.iters // 2)
        return

    from examples.minimal_run import run_minimal, run_minimal_fast

    if args.engine == "fast":
        run_minimal_fast(field_size=(args.size, args.size), iters=args.iters,
                         chunk=5, plot=True)
    else:
        from die_tpu.models.gradient import PhysarumPolicy

        n = args.size * args.size
        run_minimal(PhysarumPolicy(max_agents=n, scale=0.006, turn_angle=30,
                                   sense_offset=0.04),
                    field_size=(args.size, args.size), iters=args.iters,
                    chunk=5, plot=True)


if __name__ == "__main__":
    main()
