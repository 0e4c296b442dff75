"""Map compiled-HLO op names (fusion.N, while.N, ...) back to source.

trace_ops.py names the expensive device ops of the jitted frame; this
tool compiles the same step and prints, for each requested op, the
jax source locations (HLO metadata op_name/source_file) of the ops
inside its fused computation — turning "fusion.180 = 21 ms" into
"mesh.py:183 scatter-min".

    python tools/hlo_map.py fusion.180 while.56 cond.9 [--no-mesh]
                            [--volumes 64] [--dump /tmp/step.hlo]

Compiling for the TPU needs the real backend; run it on the TPU host
(the compile hits the persistent cache when bench/trace ran first).
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="*", help="op names, e.g. fusion.180")
    ap.add_argument("--volumes", type=int, default=64)
    ap.add_argument("--no-mesh", action="store_true")
    ap.add_argument("--dump", default=None,
                    help="also write the full HLO text here")
    ap.add_argument("--parse", default=None,
                    help="parse an existing HLO text dump instead of "
                         "recompiling")
    args = ap.parse_args()

    if args.parse:
        with open(args.parse) as f:
            txt = f.read()
    else:
        from multivolumes_tpu.utils.platform import configure_for_host

        configure_for_host()

        import jax

        from multivolumes_tpu.config import RenderConfig
        from multivolumes_tpu.core import camera as cam_lib
        from multivolumes_tpu.engine import MultiRayCaster
        from multivolumes_tpu.render import frame as frame_lib

        cfg = RenderConfig(
            width=1280, height=800, grid_size=128, light_grid_size=96,
            max_ray_samples=256, max_light_samples=96,
            num_volumes=args.volumes, num_volume_srcs=10,
            cube_map_size=128, shadow_map_size=1024,
        )
        engine = MultiRayCaster(cfg)
        bunny = "/root/reference/Bin/Assets/bunny.obj"
        if not args.no_mesh and os.path.exists(bunny):
            engine.set_mesh(bunny)
        cfg = engine.config

        def step(state, camera):
            out = frame_lib.render_frame(state, camera, cfg, use_taa=True)
            return out.image, out.state

        camera = cam_lib.orbit_camera(0.0, cfg.aspect_ratio)
        txt = (
            jax.jit(step, donate_argnums=(0,))
            .lower(engine.state, camera)
            .compile()
            .as_text()
        )
        if args.dump:
            with open(args.dump, "w") as f:
                f.write(txt)
            print(f"dumped {len(txt) / 1e6:.1f} MB to {args.dump}")

    # Parse: instruction lines "  %name.N = ... calls=%comp / fused
    # computations are "%fused_computation.N (...)" blocks; each op line
    # may carry metadata={op_name="..." source_file="..." source_line=N}
    comp_of_op = {}   # fusion.180 -> fused_computation name
    meta_of_comp = collections.defaultdict(collections.Counter)
    cur_comp = None
    op_meta_re = re.compile(
        r'op_name="([^"]*)"(?:.*?source_file="([^"]*)".*?source_line=(\d+))?')
    for line in txt.splitlines():
        m = re.match(r"%?([\w\-.]+) \(", line)
        if m and not line.startswith(" "):
            cur_comp = m.group(1)
            continue
        im = re.match(r"\s+(?:ROOT )?%?([\w\-.]+) = ", line)
        if not im:
            continue
        name = im.group(1)
        cm = re.search(r"(?:calls|to_apply|fusion)=%?([\w\-.]+)", line)
        if cm:
            comp_of_op[name] = cm.group(1)
        bm = re.search(r"(?:body|condition)=%?([\w\-.]+)", line)
        if bm:
            comp_of_op.setdefault(name, bm.group(1))
        mm = op_meta_re.search(line)
        if mm and cur_comp:
            label = mm.group(1)
            if mm.group(2):
                label += f"  [{os.path.basename(mm.group(2))}:{mm.group(3)}]"
            meta_of_comp[cur_comp][label] += 1

    wanted = args.ops or list(comp_of_op)[:0]
    for op in wanted:
        comp = comp_of_op.get(op)
        print(f"\n=== {op} -> {comp}")
        if not comp:
            # maybe it IS a computation or has inline metadata
            continue
        for label, n in meta_of_comp[comp].most_common(12):
            print(f"   x{n:4d}  {label}")


if __name__ == "__main__":
    main()
