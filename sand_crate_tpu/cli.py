"""Command-line interface.

The reference exposes ``main(config_file_path, play_recording=None)`` via
fire (main.py:19,40) and hardcodes a 48-variant sequential coefficient sweep
(main.py:10-16,26-36).  Here the same surface is argparse-based (fire is not
in the image) and the sweep is optional and can run *vmapped in parallel on
device* (see sweep.py) instead of sequentially:

    python -m sand_crate_tpu run configs/stirring_cup.yaml [--headless]
    python -m sand_crate_tpu replay data/recordings/<stamp>
    python -m sand_crate_tpu sweep configs/stirring_cup.yaml --ticks 400
    python -m sand_crate_tpu bench --particles 100000
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from .config import load_config

# The reference's hardcoded sweep grid (main.py:10-16), kept as the default.
DEFAULT_SWEEP_OPTIONS = {
    "pressure_amplifier": [20, 40],
    "ignored_pressure": [0.3, 0.1],
    "viscosity": [4, 8],
    "surface_smoothing": [40, 100],
    "target_pressure": [-5, -2, 2],
}


def config_options(options: dict, config):
    """Cartesian-product config variants (main.py:26-36), isolated copies."""
    import copy
    import itertools

    keys = list(options.keys())
    for values in itertools.product(*(options[k] for k in keys)):
        variant = copy.deepcopy(config)
        for k, v in zip(keys, values):
            variant.world_config.coefficients[k] = v
        yield variant


def cmd_run(args) -> None:
    from .playback import Playback

    config = load_config(args.config)
    if args.ticks:
        config.playback_config.ticks_to_record = args.ticks
    if args.output:
        # an explicit output dir implies recording, whatever the scene says
        config.playback_config.save_recording = True
    if args.no_record:
        config.playback_config.save_recording = False
    playback = Playback(
        config,
        recording_dir_path=Path(args.output) if args.output else None,
        headless=args.headless,
        crate_kwargs=dict(instrument=True) if args.instrument else None,
        show_indices=args.show_indices,
    )
    if args.resume:
        playback.crate.restore_checkpoint(args.resume)
        print(f"resumed from {args.resume} at tick {playback.crate.tick}")
    playback.run_live_simulation(ticks_per_frame=args.ticks_per_frame)


def cmd_replay(args) -> None:
    from .playback import replay

    replay(Path(args.recording), headless=args.headless)


def cmd_sweep(args) -> None:
    if args.vmapped:
        from .sweep import run_vmapped_sweep

        run_vmapped_sweep(
            load_config(args.config),
            DEFAULT_SWEEP_OPTIONS,
            ticks=args.ticks or 400,
        )
        return
    from .playback import Playback

    config = load_config(args.config)
    for i, variant in enumerate(config_options(DEFAULT_SWEEP_OPTIONS, config)):
        print(f"--- sweep variant {i} ---")
        if args.ticks:
            variant.playback_config.ticks_to_record = args.ticks
        Playback(variant, headless=args.headless).run_live_simulation()


def cmd_datagen(args) -> None:
    from .sweep import run_datagen

    run_datagen(
        load_config(args.config),
        n_crates=args.crates,
        ticks=args.ticks,
        sample_every=args.sample_every,
        out_dir=args.out,
        seed=args.seed,
    )


def cmd_bench(args) -> None:
    import bench

    bench.main(particles=args.particles, ticks=args.ticks or 100)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sand_crate_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="run a scene live")
    run.add_argument("config")
    run.add_argument("--headless", action="store_true")
    run.add_argument("--ticks", type=int)
    run.add_argument("--output")
    run.add_argument("--no-record", action="store_true")
    run.add_argument(
        "--resume", help="checkpoint.npz from a previous recording to resume from"
    )
    run.add_argument(
        "--ticks-per-frame",
        type=int,
        default=1,
        help="headless: physics ticks per recorded frame (device-resident chunks)",
    )
    run.add_argument(
        "--instrument",
        action="store_true",
        help="per-phase timing overlay: run the tick as phase-split programs",
    )
    run.add_argument(
        "--show-indices",
        action="store_true",
        help="draw per-particle/segment index labels (reference playback.py:187-206)",
    )
    run.set_defaults(fn=cmd_run)

    rep = sub.add_parser("replay", help="replay a recording")
    rep.add_argument("recording")
    rep.add_argument("--headless", action="store_true")
    rep.set_defaults(fn=cmd_replay)

    sw = sub.add_parser("sweep", help="coefficient grid sweep")
    sw.add_argument("config")
    sw.add_argument("--headless", action="store_true")
    sw.add_argument("--ticks", type=int)
    sw.add_argument("--vmapped", action="store_true", help="all variants in parallel on device")
    sw.set_defaults(fn=cmd_sweep)

    dg = sub.add_parser("datagen", help="batched randomized-crate data generation")
    dg.add_argument("config")
    dg.add_argument("--crates", type=int, default=1024)
    dg.add_argument("--ticks", type=int, default=600)
    dg.add_argument("--sample-every", type=int, default=20)
    dg.add_argument("--out", default="data/datagen")
    dg.add_argument("--seed", type=int, default=0)
    dg.set_defaults(fn=cmd_datagen)

    be = sub.add_parser("bench", help="throughput benchmark")
    be.add_argument("--particles", type=int, default=100_000)
    be.add_argument("--ticks", type=int)
    be.set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
