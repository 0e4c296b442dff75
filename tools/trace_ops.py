"""Device-op time breakdown of the full jitted frame via jax.profiler.

Runs N animated frames of the bench workload under a profiler trace,
then parses the emitted perfetto JSON and aggregates *device-lane* op
durations by fusion/op name. This is the tool that localizes "frame
glue": every XLA fusion that isn't one of the named passes shows up
here with its real per-frame cost.

    python tools/trace_ops.py [--frames 4] [--volumes 64] [--no-mesh]
                              [--top 40] [--min-ms 0.05]

Output: one line per op name — total ms/frame, count/frame — sorted by
cost, plus the device-total. (The host lanes are excluded: on this
1-core host they overlap the device and would double-count; use the
raw trace in xprof for host-side stalls.)
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_PASS_SCOPES = ("prep", "mesh", "light", "orient", "sweep", "composite",
                "sky", "tail")


def _scope_of(op_name: str) -> str:
    """Pass scope from an HLO metadata op_name: render_frame wraps every
    pass body in jax.named_scope, so op_name looks like
    'jit(step)/mesh/raster/scatter-min'. Returns the first path segment
    that names a pass, else 'glue'."""
    for seg in op_name.split("/"):
        if seg in _PASS_SCOPES:
            return seg
    return "glue"


def _file_of_ops(hlo_path: str):
    """fusion.N -> (dominant source file, dominant pass scope), from an
    HLO text dump (see tools/hlo_map.py for the format)."""
    import collections as c
    import re as re_

    comp_of_op = {}
    meta = c.defaultdict(c.Counter)
    scope = c.defaultdict(c.Counter)
    cur = None
    mre = re_.compile(r'source_file="([^"]*)"')
    ore = re_.compile(r'op_name="([^"]*)"')
    with open(hlo_path) as f:
        for line in f:
            m = re_.match(r"%?([\w\-.]+) \(", line)
            if m and not line.startswith(" "):
                cur = m.group(1)
                continue
            im = re_.match(r"\s+(?:ROOT )?%?([\w\-.]+) = ", line)
            if not im:
                continue
            cm = re_.search(r"(?:calls|to_apply|fusion|body)=%?([\w\-.]+)",
                            line)
            if cm:
                comp_of_op[im.group(1)] = cm.group(1)
            mm = mre.search(line)
            if mm and cur:
                meta[cur][os.path.basename(mm.group(1))] += 1
            om = ore.search(line)
            if om:
                # computation bodies accumulate votes for their calling
                # fusion; every op also records its own scope directly
                # (covers non-calling ops: copies, standalone HLO)
                sc = _scope_of(om.group(1))
                if cur:
                    scope[cur][sc] += 1
                scope["@" + im.group(1)][sc] += 1
    out = {}
    scope_out = {}
    for op, comp in comp_of_op.items():
        if meta.get(comp):
            out[op] = meta[comp].most_common(1)[0][0]
        if scope.get(comp):
            scope_out[op] = scope[comp].most_common(1)[0][0]
    # ops with their own metadata (non-fusion, e.g. standalone copies)
    for key, ctr in scope.items():
        if key.startswith("@"):
            scope_out.setdefault(key[1:], ctr.most_common(1)[0][0])
    return out, scope_out


def summarize(trace_dir: str, frames: int, top: int, min_ms: float,
              hlo: str | None = None):
    files = sorted(glob.glob(
        os.path.join(trace_dir, "**/*.trace.json.gz"), recursive=True))
    if not files:
        print("no trace found under", trace_dir)
        return
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])

    # device lanes: process-name metadata containing TPU/XLA Ops
    dev_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm or "XLA Ops" in nm:
                dev_pids.add(e.get("pid"))

    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0) / 1000.0  # us -> ms
        cnt[name] += 1
    if not tot:
        print("no device events; pids seen:", dev_pids)
        return
    total = sum(tot.values())
    print(f"device total: {total / frames:8.2f} ms/frame "
          f"({len(tot)} distinct ops, {frames} frames)")
    for name, ms in tot.most_common(top):
        ms_f = ms / frames
        if ms_f < min_ms:
            break
        print(f"  {ms_f:8.3f} ms/f  x{cnt[name] / frames:6.1f}  {name}")

    if hlo and os.path.exists(hlo):
        # aggregate by dominant source file — names the long tail
        fof, sof = _file_of_ops(hlo)
        by_file = collections.Counter()
        by_pass = collections.Counter()
        for name, ms in tot.items():
            if name.startswith("jit_") or name.startswith("jit("):
                continue  # parent span double-counts children
            key = name.rstrip("}")
            by_file[fof.get(key, f"<{name.split('.')[0]}>")] += ms
            by_pass[sof.get(key, "glue")] += ms
        print("\nby source file (device ms/frame):")
        for fname, ms in by_file.most_common(30):
            if ms / frames < 0.02:
                break
            print(f"  {ms / frames:8.3f}  {fname}")
        # per-PASS in-frame attribution (jax.named_scope in render_frame
        # -> HLO op_name metadata): the numbers SUM to the device total,
        # so this table — not bench's standalone-jit breakdown — is the
        # instrument of record for "which pass costs what"
        print("\nby pass scope (device ms/frame, sums to total):")
        for sc, ms in by_pass.most_common():
            print(f"  {ms / frames:8.3f}  {sc}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--volumes", type=int, default=64)
    ap.add_argument("--no-mesh", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--min-ms", type=float, default=0.05)
    ap.add_argument("--dir", default="/tmp/mv_trace")
    ap.add_argument("--hlo", default=None,
                    help="HLO text dump (tools/hlo_map.py --dump) to "
                         "aggregate the trace by source file; pass "
                         "'auto' to dump the compiled step here first")
    ap.add_argument("--scan", type=int, default=0,
                    help="trace the K-frame lax.scan dispatch "
                         "(render_frames) instead of the per-frame "
                         "async loop — attributes the scan-vs-async "
                         "gap bench.py reports")
    args = ap.parse_args()

    from multivolumes_tpu.utils.platform import configure_for_host

    configure_for_host()

    import jax

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.engine import MultiRayCaster
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.utils.timing import sync

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
        # the demo orbit's host-side ladder pick (same call bench.py
        # makes) — without it the trace profiles the near preset's
        # full-screen shade, not the production far path
        engine.select_raster_preset((0.0, 6.0, 60.0))
    cfg = engine.config

    if args.scan:
        import jax.numpy as jnp

        k = args.scan

        def scan_step(state, cams):
            return frame_lib.render_frames(state, cams, cfg, use_taa=True)

        scan_jit = jax.jit(lambda s, c: scan_step(s, c)[::-1],
                           donate_argnums=(0,))

        def cam_block(f0):
            cams = [cam_lib.orbit_camera((f0 + i + 1) / 60.0,
                                         cfg.aspect_ratio)
                    for i in range(k)]
            return jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, 0), *cams)

        state = engine.state
        st, imgs = scan_jit(state, cam_block(-k))
        sync(imgs)
        os.makedirs(args.dir, exist_ok=True)
        jax.profiler.start_trace(args.dir)
        for b in range(0, args.frames, k):
            st, imgs = scan_jit(st, cam_block(b))
        sync(imgs)
        jax.profiler.stop_trace()
        n = max(args.frames // k, 1) * k
        summarize(args.dir, n, args.top, args.min_ms, hlo=None)
        return

    def step(state, camera):
        out = frame_lib.render_frame(state, camera, cfg, use_taa=True,
                                     planar=True)
        return out.image, out.state

    step_jit = jax.jit(step, donate_argnums=(0,))
    state = engine.state
    camera = cam_lib.orbit_camera(0.0, cfg.aspect_ratio)
    if args.hlo == "auto":
        # dump the scheduled HLO of this exact step for the by-file
        # aggregation (hits the compile cache the warmup also uses)
        args.hlo = "/tmp/step.hlo"
        txt = step_jit.lower(state, camera).compile().as_text()
        with open(args.hlo, "w") as f:
            f.write(txt)
        print(f"dumped {len(txt) / 1e6:.1f} MB to {args.hlo}", file=sys.stderr)
    img, state = step_jit(state, camera)
    sync(img)

    os.makedirs(args.dir, exist_ok=True)
    jax.profiler.start_trace(args.dir)
    for f in range(args.frames):
        camera = cam_lib.orbit_camera((f + 1) / 60.0, cfg.aspect_ratio)
        img, state = step_jit(state, camera)
    sync(img)
    jax.profiler.stop_trace()
    summarize(args.dir, args.frames, args.top, args.min_ms, hlo=args.hlo)


if __name__ == "__main__":
    main()
