"""CLI argument surface: every subcommand parses with its documented flags."""

import pytest

from sand_crate_tpu.cli import DEFAULT_SWEEP_OPTIONS, build_parser, config_options


@pytest.fixture()
def parser():
    return build_parser()


def test_run_flags(parser):
    a = parser.parse_args(
        [
            "run",
            "configs/stirring_cup.yaml",
            "--headless",
            "--ticks",
            "50",
            "--output",
            "/tmp/x",
            "--resume",
            "/tmp/x/checkpoint.npz",
            "--ticks-per-frame",
            "5",
        ]
    )
    assert a.command == "run" and a.ticks == 50 and a.ticks_per_frame == 5
    assert a.resume.endswith("checkpoint.npz")


def test_replay_sweep_datagen_bench(parser):
    assert parser.parse_args(["replay", "/tmp/rec"]).command == "replay"
    s = parser.parse_args(["sweep", "c.yaml", "--vmapped", "--ticks", "9"])
    assert s.vmapped and s.ticks == 9
    d = parser.parse_args(
        ["datagen", "c.yaml", "--crates", "7", "--sample-every", "3"]
    )
    assert d.crates == 7 and d.sample_every == 3
    b = parser.parse_args(["bench", "--particles", "123"])
    assert b.particles == 123


def test_missing_command_errors(parser):
    with pytest.raises(SystemExit):
        parser.parse_args([])


def test_config_options_isolated_variants(stirring_cup_config):
    """The sweep grid matches the reference's 48 variants and each variant is
    an isolated copy (upstream mutates a shared config, main.py:34-35)."""
    variants = list(config_options(DEFAULT_SWEEP_OPTIONS, stirring_cup_config))
    assert len(variants) == 48  # 2*2*2*2*3 (main.py:10-16)
    v0, v1 = variants[0], variants[1]
    assert v0 is not stirring_cup_config
    v0.world_config.coefficients["viscosity"] = 999
    assert v1.world_config.coefficients["viscosity"] != 999
