"""CLI argument handling (the main.cpp analogue's contract)."""

from vkrt_tpu.app.cli import build_parser, resolve_config


def test_config_selection():
    p = build_parser()
    args = p.parse_args(["--config", "3"])
    cfg = resolve_config(args)
    assert (cfg.width, cfg.height) == (1280, 720)
    assert cfg.max_depth == 2 and cfg.enable_reflections


def test_overrides():
    p = build_parser()
    args = p.parse_args(["--config", "1", "--width", "320", "--height", "240",
                         "--lights", "2", "--no-shadows"])
    cfg = resolve_config(args)
    assert (cfg.width, cfg.height) == (320, 240)
    assert cfg.num_lights == 2
    assert not cfg.enable_shadows


def test_default_is_reference_workload():
    p = build_parser()
    cfg = resolve_config(p.parse_args([]))
    assert (cfg.width, cfg.height) == (1600, 1200)   # ref: src/Utils.hpp:32-33
    assert cfg.max_depth == 2 and cfg.num_lights == 4


def test_raster_flags():
    p = build_parser()
    args = p.parse_args(["--raster", "--msaa", "1"])
    assert args.raster and args.msaa == 1
