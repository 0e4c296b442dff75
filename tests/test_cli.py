"""CLI parity of the `-volume [FILE] X Y Z SCALE` argument
(`MultiVolumes.cpp:559-568`: optional file into source 0, then
positional placement floats, any trailing subset)."""

from multivolumes_tpu.app import build_arg_parser, parse_volume_arg


def _parse_volume(tokens):
    args = build_arg_parser().parse_args(["--volume", *tokens])
    return parse_volume_arg(args.volume)


def test_volume_numbers_only():
    f, ps = _parse_volume(["1", "2", "3", "20"])
    assert f is None
    assert ps == [1.0, 2.0, 3.0, 20.0]


def test_volume_file_and_placement():
    f, ps = _parse_volume(["smoke.dds", "0", "-9", "0", "5"])
    assert f == "smoke.dds"
    assert ps == [0.0, -9.0, 0.0, 5.0]


def test_volume_file_partial_floats_keep_defaults():
    # the reference only overwrites as many components as are present
    f, ps = _parse_volume(["smoke.dds", "1.5"])
    assert f == "smoke.dds"
    assert ps == [1.5, 0.0, 0.0, 10.0]


def test_volume_file_only():
    f, ps = _parse_volume(["smoke.dds"])
    assert f == "smoke.dds"
    assert ps == [0.0, 0.0, 0.0, 10.0]


def test_interactive_commands_flip_engine_state():
    """Runtime hotkey analog (`MultiVolumes::OnKeyUp`,
    MultiVolumes.cpp:447-479): each command must flip the live engine's
    config (a new jit-cache key) or the harness ui state — no process
    restart."""
    from multivolumes_tpu.app import apply_command
    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.engine import MultiRayCaster

    cfg = RenderConfig(width=64, height=48, grid_size=8, light_grid_size=8,
                       max_ray_samples=8, max_light_samples=4,
                       num_volumes=2, num_volume_srcs=1,
                       cube_map_size=8, shadow_map_size=16)
    eng = MultiRayCaster(cfg)
    ui = {"paused": False, "animate": False, "taa": True, "fps": True,
          "screenshot": False}

    assert apply_command("o", eng, ui)           # OIT cycle
    assert eng.config.composite_mode == "tile"
    apply_command("o", eng, ui)
    assert eng.config.composite_mode == "warp"
    apply_command("o", eng, ui)
    assert eng.config.composite_mode == "gather"

    apply_command("w", eng, ui)                  # work-graph analog
    assert eng.config.march_mode == "reference"
    apply_command("w", eng, ui)
    assert eng.config.march_mode == "sweep"

    apply_command("m", eng, ui)                  # no mesh loaded: no-op
    assert not eng.config.show_mesh

    for key, flag in (("p", "paused"), ("a", "animate"), ("t", "taa"),
                      ("f", "fps")):
        before = ui[flag]
        apply_command(key, eng, ui)
        assert ui[flag] != before

    apply_command("s", eng, ui)
    assert ui["screenshot"]
    assert not apply_command("q", eng, ui)       # quit returns False

    # a flipped config must still render (fresh jit-cache entry)
    eng.config = cfg.with_(composite_mode="gather", use_bf16=False,
                           packed_composite=False)
    img = eng.render()
    assert img.shape == (48, 64, 3)
