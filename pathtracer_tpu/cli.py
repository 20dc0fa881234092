"""Command-line entry point.

Keeps the reference's CLI contract — ``main scene=<file> frame=<n>``
key=value arguments (``src/main.cpp:32-43``) — and layers standard flags
on top.  Where the reference drives a GLUT window and re-renders forever
(``main.cpp:94,201``), this is a headless progressive renderer with
periodic preview dumps, per-frame image save, multi-frame animation
advance (``main.cpp:163-173``), and checkpoint/resume.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import jax
import numpy as np

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.ops.tonemap import tonemap
from pathtracer_tpu.scene.parser import load_scene
from pathtracer_tpu.utils.imageio import save_image


# auto-resume retry budget: transient faults (preemption, collective
# errors) clear on retry; a deterministic failure (NaN physics under
# --debug) recurs and exhausts this, re-raising the original error
MAX_FAILURE_RETRIES = 3


def _split_kv_args(argv):
    """Accept the reference's `scene=x frame=n` positionals alongside
    normal flags."""
    kv, rest = {}, []
    for a in argv:
        if "=" in a and not a.startswith("-"):
            k, v = a.split("=", 1)
            kv[k] = v
        else:
            rest.append(a)
    return kv, rest


def build_argparser():
    p = argparse.ArgumentParser(
        prog="pathtracer-tpu", description="TPU-native differentiable path tracer"
    )
    p.add_argument("--scene", help="scene DSL file")
    p.add_argument("--frame", type=int, default=0, help="start animation frame")
    p.add_argument("--spp", type=int, default=None, help="override ITERATIONS")
    p.add_argument("--depth", type=int, default=8, help="max path depth")
    p.add_argument("--out", default=None, help="override output image path")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-jitter", action="store_true", help="disable AA jitter")
    p.add_argument(
        "--engine",
        choices=["auto", "wavefront", "megakernel"],
        default="auto",
        help="path tracing engine (auto: the full-depth fused-trace "
        "megakernel for analytic scenes on TPU, wavefront otherwise)",
    )
    p.add_argument("--preview-every", type=int, default=0, help="dump preview PNG every N spp")
    p.add_argument("--checkpoint-every", type=int, default=0, help="save resume state every N spp")
    p.add_argument("--checkpoint", default=None, help="checkpoint file to resume from / write")
    p.add_argument("--all-frames", action="store_true", help="render every animation frame")
    p.add_argument(
        "--motion-blur",
        action="store_true",
        help="render the shutter interval [frame, frame+1] with motion blur",
    )
    p.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. cpu) before first device use",
    )
    p.add_argument(
        "--sharded",
        action="store_true",
        help="render on every addressable device (1-D jax.sharding.Mesh, "
        "strided pixel ownership); multi-host via jax.distributed when "
        "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID "
        "are set (see parallel/mesh.py)",
    )
    p.add_argument(
        "--interactive",
        action="store_true",
        help="interactive camera REPL (elective: WASD moves, live preview)",
    )
    p.add_argument(
        "--debug",
        action="store_true",
        help="debug mode: jax_debug_nans + per-chunk finite checks + "
        "per-bounce alive-lane histogram (megakernel engine)",
    )
    p.add_argument(
        "--resume-on-failure",
        action="store_true",
        help="failure detection -> auto-resume: if a render chunk raises "
        "(XLA runtime fault, collective error, --debug finite check), "
        "reload the last good checkpoint and retry from it (up to "
        f"{MAX_FAILURE_RETRIES} times); requires --checkpoint + "
        "--checkpoint-every for mid-frame resume points",
    )
    return p


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    kv, rest = _split_kv_args(argv)
    parser = build_argparser()
    args = parser.parse_args(rest)
    if "scene" in kv:
        args.scene = kv["scene"]
    if "frame" in kv:
        args.frame = int(kv["frame"])
    if not args.scene:
        parser.error("a scene file is required (scene=<file> or --scene)")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.sharded:
        if args.interactive or args.motion_blur:
            parser.error("--sharded does not combine with --interactive/--motion-blur")
        # multi-host rendezvous (no-op single-host) MUST precede first
        # device use — the analog of the reference binding its device in
        # the entry point (main.cpp:296-305)
        from pathtracer_tpu.parallel.mesh import initialize_distributed

        initialize_distributed()

    desc = load_scene(args.scene)
    spp = args.spp if args.spp is not None else desc.iterations
    engine = args.engine
    if engine == "auto":
        # megakernel = the full-depth fused trace for eligible scenes on
        # TPU (ops/trace_pallas.py, ~1.8x the wavefront engine on
        # cornell); the wavefront engine's lane regeneration wins on the
        # split-path classes (meshes / image textures / CT-Ward-HG)
        from pathtracer_tpu.ops.trace_pallas import fused_trace_eligible
        from pathtracer_tpu.render.diff import resolve_features

        probe_cfg = resolve_features(
            RenderConfig(), desc.scene_for_frame(args.frame).materials
        )
        eligible = fused_trace_eligible(
            desc.scene_for_frame(args.frame), probe_cfg
        )
        engine = (
            "megakernel"
            if (eligible and jax.default_backend() == "tpu")
            else "wavefront"
        )
    cfg = RenderConfig(
        max_depth=args.depth,
        jitter=not args.no_jitter,
        seed=args.seed,
        wavefront=(engine == "wavefront"),
        debug=args.debug,
    )

    from pathtracer_tpu.render.integrator import render
    from pathtracer_tpu.utils import checkpoint as ckpt

    if args.interactive:
        from pathtracer_tpu.render.interactive import interactive_loop

        out = args.out or "renders/interactive.png"
        interactive_loop(
            desc, args.frame, cfg,
            preview_spp=min(spp, 16), out_path=out, full_spp=spp,
        )
        return 0

    mesh = None
    if args.sharded:
        from pathtracer_tpu.parallel.mesh import make_mesh
        from pathtracer_tpu.parallel.sharded import gather_image, render_sharded

        mesh = make_mesh()
        cfg = dataclasses.replace(cfg, wavefront=True)
    is_main = jax.process_index() == 0

    frames = range(desc.frames) if args.all_frames else [args.frame]
    for frame in frames:
        scene = desc.scene_for_frame(frame)
        w, h = scene.camera.width, scene.camera.height
        if is_main:
            print(
                f"[pathtracer-tpu] frame {frame}: {w}x{h}, {spp} spp, depth "
                f"{cfg.max_depth}, engine={engine}, "
                f"devices={jax.device_count()}"
                + (f" (sharded, {jax.process_count()} process(es))" if args.sharded else "")
            )

        accum = None
        start_it = 0
        if args.checkpoint:
            state = ckpt.load(args.checkpoint)
            if state is not None and state["frame"] == frame:
                # checkpoints are pixel-ordered — layout-independent, so a
                # single-device checkpoint resumes sharded and vice versa
                accum, start_it = state["accum"], int(state["spp_done"])
                if is_main:
                    print(f"  resumed at {start_it} spp from {args.checkpoint}")

        t0 = time.perf_counter()

        def run_frame(accum, start_it, *, _frame=frame):
            """One render attempt from (accum, start_it); raises on a
            failed chunk — the auto-resume loop below catches it."""
            last = {"t": time.perf_counter(), "spp": start_it}

            def progress(done_in_run, acc):
                done = start_it + done_in_run
                now = time.perf_counter()
                want_preview = args.preview_every and done % args.preview_every == 0
                want_ckpt = (
                    args.checkpoint
                    and args.checkpoint_every
                    and done % args.checkpoint_every == 0
                )
                if args.sharded and (want_preview or want_ckpt):
                    # device-major sharded accumulator -> pixel order (the
                    # only cross-device data movement outside image readout)
                    acc = gather_image(acc, mesh)
                if want_preview and is_main:
                    img = np.asarray(tonemap(acc.reshape(h, w, 3), done))
                    save_image(_out_path(args, desc, _frame, suffix=".preview"), img)
                if want_ckpt and is_main:
                    ckpt.save(args.checkpoint, acc, done, _frame, cfg.seed)
                rate = (done - last["spp"]) * w * h / max(now - last["t"], 1e-9) / 1e6
                last["t"], last["spp"] = now, done
                if is_main:
                    print(f"  {done}/{spp} spp  ({rate:.1f} Mpaths/s)")

            if args.motion_blur:
                from pathtracer_tpu.render.motion import render_motion

                out = render_motion(
                    desc, _frame, spp - start_it, cfg,
                    base_key=jax.random.PRNGKey(cfg.seed), progress_fn=progress,
                )
            elif args.sharded:
                out = render_sharded(
                    scene,
                    spp - start_it,
                    cfg,
                    mesh=mesh,
                    base_key=jax.random.PRNGKey(cfg.seed),
                    progress_fn=progress,
                    accum=accum,
                    start_iteration=start_it,
                )
            else:
                out = render(
                    scene,
                    spp - start_it,
                    cfg,
                    base_key=jax.random.PRNGKey(cfg.seed),
                    accum=accum,
                    start_iteration=start_it,
                    progress_fn=progress,
                )
            jax.block_until_ready(out[0])
            return out

        # failure detection -> auto-resume (SURVEY §5: failures surface as
        # raised XLA/collective errors; the progressive accumulator is the
        # natural restart point — reference analog: atexit(cleanupCuda) +
        # cudaDeviceReset, main.cpp:303,159).  The periodic checkpoint
        # written by progress() IS the last good state; reload and retry.
        attempts = 0
        while True:
            try:
                img, accum, stats = run_frame(accum, start_it)
                break
            except KeyboardInterrupt:
                raise
            except Exception as e:
                attempts += 1
                if not args.resume_on_failure or attempts > MAX_FAILURE_RETRIES:
                    raise
                accum, start_it = None, 0
                if args.checkpoint:
                    state = ckpt.load(args.checkpoint)
                    if state is not None and state["frame"] == frame:
                        accum, start_it = state["accum"], int(state["spp_done"])
                if is_main:
                    print(
                        f"  render failed ({type(e).__name__}: {e}); "
                        f"resuming from {start_it} spp "
                        f"(attempt {attempts}/{MAX_FAILURE_RETRIES})"
                    )
        dt = time.perf_counter() - t0
        if is_main:
            out = _out_path(args, desc, frame)
            path = save_image(out, np.asarray(img))
            mrays = stats["rays_traced"] / dt / 1e6
            mpaths = (spp - start_it) * w * h / dt / 1e6
            print(
                f"  saved {path} ({dt:.1f}s, {mpaths:.1f} Mpaths/s, "
                f"{mrays:.1f} Mrays/s)"
            )
    return 0


def _out_path(args, desc, frame, suffix=""):
    base = args.out or desc.image_name
    if "." in base:
        stem, ext = base.rsplit(".", 1)
    else:
        stem, ext = base, "png"
    # reference appends ".<frame>" before the extension (main.cpp:148-152)
    return f"{stem}.{frame}{suffix}.{ext}"


if __name__ == "__main__":
    sys.exit(main())
