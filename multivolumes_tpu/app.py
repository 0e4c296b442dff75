"""Offline app harness: the `MultiVolumes` shell without a window.

Mirrors the reference's CLI (`MultiVolumes::ParseCommandLineArgs`,
`MultiVolumes.cpp:543-613`) and per-frame loop (`OnUpdate`/`OnRender`):
renders F frames of the demo scene (optionally with the orbit-camera
animation of `MultiVolumes.cpp:328-337`) and writes PNG screenshots — the
F11 path (`MultiVolumes.cpp:744-764`). Run:

    python -m multivolumes_tpu.app --numVolumes 4 --frames 8 --out out.png
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core import camera as cam_lib
from multivolumes_tpu.engine import MultiRayCaster
from multivolumes_tpu.render.postprocess import srgb_encode
from multivolumes_tpu.utils.png import write_png
from multivolumes_tpu.utils.steptimer import StepTimer


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # reference flags (`MultiVolumes.cpp:543-613`)
    p.add_argument("--gridSize", type=int, default=128)
    p.add_argument("--lightGridSize", type=int, default=96)
    p.add_argument("--maxRaySamples", type=int, default=256)
    p.add_argument("--maxLightSamples", type=int, default=96)
    p.add_argument("--numVolumes", type=int, default=2)
    p.add_argument("--volume", nargs="+", default=None, action="append",
                   metavar="[FILE] X Y Z SCALE",
                   help="reference -volume parity "
                        "(`MultiVolumes.cpp:559-568`): an optional R32F "
                        "volume DDS loaded into source 0, then the scene "
                        "placement x y z scale (any trailing subset, as "
                        "in the reference); numbers-only keeps the "
                        "procedural volumes. REPEATABLE: occurrence k's "
                        "file loads into volume source k (the reference "
                        "ships a fixed 10-file source list, "
                        "MultiVolumes.cpp:58-67, and cycles volumes "
                        "across sources i %% numVolumeSrcs — repetition "
                        "makes that multi-source scene reachable from "
                        "the CLI); later placement floats win (the "
                        "reference's last-wins stof loop)")
    p.add_argument("--volumeFile", type=str, default=None,
                   help="R32F volume DDS loaded into source 0 (alias for "
                        "the file part of --volume)")
    p.add_argument("--radiance", type=str, default=None,
                   help="radiance cube-map DDS (LightProbe::Init)")
    p.add_argument("--uma", action="store_true",
                   help="accepted for reference CLI parity; adapter "
                        "selection does not apply on TPU")
    p.add_argument("--mesh", type=str, default=None,
                   help="OBJ path (e.g. the reference's Assets/bunny.obj)")
    p.add_argument("--meshPos", nargs=4, type=float, default=[0.0, -9.0, 0.0, 1.8],
                   metavar=("X", "Y", "Z", "SCALE"))
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=800)
    # harness extras
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--animate", action="store_true",
                   help="orbit camera ([A] hotkey)")
    p.add_argument("--fixedTimestep", type=float, default=None, metavar="FPS",
                   help="fixed-timestep clock at the given rate "
                        "(StepTimer::SetFixedTimeStep); default variable")
    p.add_argument("--no-taa", action="store_true")
    p.add_argument("--march", choices=["sweep", "reference"], default="sweep",
                   help="view-march algorithm (see render/sweep.py)")
    p.add_argument("--warp", action="store_true",
                   help="force the CPU backend (the reference's -warp "
                        "software-adapter flag, MultiVolumes.cpp:110-128)")
    p.add_argument("--bf16", dest="bf16", action="store_true", default=None,
                   help="bfloat16 sweep compute (the default; the "
                        "reference computes in min16float)")
    p.add_argument("--f32", dest="bf16", action="store_false",
                   help="full-precision sweep compute")
    p.add_argument("--stats", action="store_true",
                   help="print per-frame cull/LOD stats (F1-style overlay)")
    p.add_argument("--interactive", action="store_true",
                   help="read hotkey commands from stdin between frames "
                        "— the headless analog of the reference's "
                        "runtime hotkeys (`MultiVolumes::OnKeyUp`, "
                        "MultiVolumes.cpp:447-479): one letter per "
                        "line — [p]ause (Space), [a]nimate, [m]esh "
                        "on/off, [o] cycle composite (the OIT-method "
                        "cycle), [w] march mode (the work-graph "
                        "dispatch toggle analog), [t] TAA, [f] FPS "
                        "line (F1), [s] screenshot now (F11), [q]uit. "
                        "Config flips re-enter the engine's per-config "
                        "jit cache (each combination compiles once).")
    p.add_argument("--out", type=str, default="frame.png")
    return p


_OIT_CYCLE = ("tile", "warp", "gather")  # the reference's [O] cycles its
#   3 OIT methods (k-buffer / ray-query / DXR); here the 3 composite
#   implementations share the k-buffer semantics (SURVEY section-7 stance)


def apply_command(cmd: str, engine, ui: dict) -> bool:
    """One hotkey command against the live engine (returns False on
    quit). Separated from the loop for direct testing; config flips go
    through `config.with_` so the engine's jit cache keys them."""
    cfg = engine.config
    if cmd == "q":
        return False
    if cmd == "p":
        ui["paused"] = not ui["paused"]
        print(f"paused={ui['paused']}")
    elif cmd == "a":
        ui["animate"] = not ui["animate"]
        print(f"animate={ui['animate']}")
    elif cmd == "m":
        if engine.state.mesh_indices.shape[0] > 1:
            engine.config = cfg.with_(show_mesh=not cfg.show_mesh)
            print(f"mesh={engine.config.show_mesh}")
        else:
            print("no mesh loaded")
    elif cmd == "o":
        cur = (_OIT_CYCLE.index(cfg.composite_mode)
               if cfg.composite_mode in _OIT_CYCLE else -1)
        mode = _OIT_CYCLE[(cur + 1) % len(_OIT_CYCLE)]
        engine.config = cfg.with_(composite_mode=mode)
        print(f"composite={mode}")
    elif cmd == "w":
        mode = "reference" if cfg.march_mode == "sweep" else "sweep"
        engine.config = cfg.with_(march_mode=mode)
        print(f"march={mode}")
    elif cmd == "t":
        ui["taa"] = not ui["taa"]
        print(f"taa={ui['taa']}")
    elif cmd == "f":
        ui["fps"] = not ui["fps"]
        print(f"fps={ui['fps']}")
    elif cmd == "s":
        ui["screenshot"] = True
    elif cmd:
        print(f"unknown command {cmd!r} "
              "(p a m o w t f s q)")
    return True


def _poll_commands(timeout: float = 0.0):
    """Non-blocking read of pending stdin lines (one command each).
    Returns (commands, eof): EOF means stop polling — the remaining
    frames still render (piped scripts end with 'q' to quit early)."""
    import select
    import sys

    cmds = []
    while True:
        ready, _, _ = select.select([sys.stdin], [], [], timeout)
        if not ready:
            return cmds, False
        line = sys.stdin.readline()
        if not line:          # EOF: commands exhausted, keep rendering
            return cmds, True
        cmds.append(line.strip().lower())
        timeout = 0.0


def parse_volume_arg(tokens, default_file=None,
                     vol_pos_scale=None):
    """-volume [FILE] x y z s (`MultiVolumes.cpp:559-568`): leading
    non-numeric token = volume file; the numbers update vol_pos_scale
    in order, keeping defaults for the rest (reference stof behavior).
    Returns (volume_file, [x, y, z, scale])."""
    volume_file = default_file
    if vol_pos_scale is None:
        vol_pos_scale = [0.0, 0.0, 0.0, 10.0]
    if tokens:
        tokens = list(tokens)
        try:
            float(tokens[0])
        except ValueError:
            volume_file = tokens.pop(0)
        for i, tok in enumerate(tokens[:4]):
            vol_pos_scale[i] = float(tok)
    return volume_file, vol_pos_scale


def parse_volume_args(occurrences, default_file=None):
    """All --volume occurrences (argparse action="append"): occurrence
    k's file maps to volume source k; the placement floats accumulate
    last-wins (one global vol_pos_scale, as in the reference).
    Returns ([file_or_None per source index], [x, y, z, scale])."""
    files = []
    vol_pos_scale = [0.0, 0.0, 0.0, 10.0]
    for k, tokens in enumerate(occurrences or [None]):
        f, vol_pos_scale = parse_volume_arg(
            tokens, default_file=(default_file if k == 0 else None),
            vol_pos_scale=vol_pos_scale)
        files.append(f)
    return files, vol_pos_scale


def main(argv=None) -> None:
    args = build_arg_parser().parse_args(argv)

    from multivolumes_tpu.utils.platform import configure_for_host

    configure_for_host(force_cpu=args.warp)

    volume_files, vol_pos_scale = parse_volume_args(
        args.volume, default_file=args.volumeFile)

    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        grid_size=args.gridSize,
        light_grid_size=args.lightGridSize,
        max_ray_samples=args.maxRaySamples,
        max_light_samples=args.maxLightSamples,
        num_volumes=args.numVolumes,
        num_volume_srcs=min(args.numVolumes, 10),
        vol_pos_scale=tuple(vol_pos_scale),
        mesh_pos_scale=tuple(args.meshPos),
        march_mode=args.march,
    )
    if args.bf16 is not None:
        cfg = cfg.with_(use_bf16=args.bf16)
    engine = MultiRayCaster(cfg)
    for k, volume_file in enumerate(volume_files[:cfg.num_volume_srcs]):
        if volume_file:
            engine.load_volume_file(k, volume_file)
    if args.radiance:
        engine.set_radiance_file(args.radiance)
    if args.mesh:
        engine.set_mesh(args.mesh)

    aspect = cfg.aspect_ratio
    # the reference ticks a StepTimer every frame (`MultiVolumes::OnUpdate`,
    # MultiVolumes.cpp:320-322) and animates from its total time; offline
    # we animate at the demo's nominal 60 Hz per rendered frame but keep
    # the timer for wall-clock stats and fixed-timestep pacing.
    timer = StepTimer()
    if args.fixedTimestep:
        timer.set_fixed_time_step(True)
        timer.set_target_elapsed_seconds(1.0 / args.fixedTimestep)
    img = None
    # runtime-toggle state (the reference's hotkey flags,
    # `MultiVolumes.cpp:447-479`); --interactive feeds it from stdin
    ui = {"paused": False, "animate": args.animate,
          "taa": not args.no_taa, "fps": True, "screenshot": False}
    anim_t = 0.0
    running = True
    polling = args.interactive
    for f in range(args.frames):
        if polling:
            cmds, eof = _poll_commands()
            polling = not eof
            for cmd in cmds:
                if not apply_command(cmd, engine, ui):
                    running = False
            if not running:
                break
        if ui["animate"]:
            camera = cam_lib.orbit_camera(anim_t, aspect)
            # host-side copy of the orbit eye (MultiVolumes.cpp:328-337)
            # for the raster-preset pick — never read back the device
            t = anim_t * 0.5
            eye_host = (np.sin(t) * 60.0, 6.0, np.cos(t) * 60.0)
            if not ui["paused"]:          # Space freezes the clock
                anim_t += 1.0 / 60.0
        else:
            camera = cam_lib.default_camera(aspect)
            eye_host = (4.0, 16.0, -80.0)   # MultiVolumes.cpp:273-278
        if args.mesh and engine.config.show_mesh:
            engine.select_raster_preset(eye_host)
        t0 = time.time()
        img = engine.render(camera, use_taa=ui["taa"])
        img.block_until_ready()
        timer.tick()
        if ui["screenshot"]:              # F11: save THIS frame now
            ui["screenshot"] = False
            shot = f"{args.out.rsplit('.', 1)[0]}_f{f}.png"
            write_png(shot, np.asarray(srgb_encode(img)))
            print(f"wrote {shot}")
        msg = f"frame {f}: {(time.time() - t0) * 1000:.1f} ms"
        if timer.frames_per_second and ui["fps"]:
            msg += f" | {timer.frames_per_second} fps"
        if args.stats:
            import jax
            import jax.numpy as jnp

            from multivolumes_tpu.render import cull as cull_lib
            from multivolumes_tpu.render.perframe import build_per_object
            from multivolumes_tpu.utils import stats as stats_lib

            po = build_per_object(engine.state.volume_worlds, camera.view_proj)
            cull = cull_lib.cull_volumes(
                po, camera.eye,
                jnp.array([cfg.width, cfg.height], jnp.float32),
                cfg.max_ray_samples, cfg.cube_map_size, cfg.num_cube_mips,
            )
            msg += " | " + stats_lib.format_stats(stats_lib.frame_stats(cull))
        print(msg)

    if img is not None:
        write_png(args.out, np.asarray(srgb_encode(img)))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
