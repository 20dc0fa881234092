"""Interactive camera (elective feature, headless REPL).

The reference's window has a keyboard callback (``src/main.cpp:221-228``;
the basecode only echoes keys and ESC-exits — the "interactive camera" is
an elective on top, README.md:66).  A TPU render node has no GLUT window,
so the TPU-native equivalent is a terminal REPL: WASD-style camera
commands, a fast progressive preview re-rendered after every move, and an
on-demand full-quality save.

The preview is **continuously progressive**, like the reference's
every-iteration redraw (``src/main.cpp:201-218``): while the REPL is idle
(no pending input), it keeps accumulating ``spp``-sized sample chunks into
the preview accumulator and rewriting the preview PNG, up to the scene's
iteration budget — watch the file to see the image refine live.  Any
camera move restarts the accumulator; ``refine N`` forces N extra chunks
immediately (and is how non-tty tests drive the progressive path).

Because the scene pytree's shapes never change, every re-render after the
first reuses the same compiled executable — moving the camera only swaps
leaf values, which is exactly the XLA-friendly way to be "interactive".

Commands (one per line, chainable: ``w w a l``):
  w / s      dolly forward / back      a / d    truck left / right
  q / e      pedestal down / up        i / k    pitch up / down
  j / l      yaw left / right          + / -    zoom in / out (fov)
  spp N      preview samples           save [f] full-quality render
  refine N   accumulate N more chunks  reset    restore the scene camera
  stat       print camera state        help     this text
  quit       exit
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

HELP = __doc__[__doc__.index("Commands") :]

MOVE_FRAC = 0.05  # dolly/truck step as a fraction of |view|
ROT_DEG = 5.0  # pitch/yaw step
ZOOM_DEG = 2.5  # fov step

# every bare token the REPL understands (used to disambiguate "save [f]")
_COMMANDS = frozenset(
    "w s a d q e i k j l + - spp save refine reset stat help quit exit".split()
)


def _input_pending(stream, timeout: float) -> bool:
    """True if ``stream`` has input ready within ``timeout`` seconds.
    Non-selectable streams (StringIO test rigs, pipes on exotic
    platforms) report "pending" so the idle-refine loop steps aside."""
    try:
        import select

        r, _, _ = select.select([stream], [], [], timeout)
        return bool(r)
    except (OSError, ValueError, TypeError, AttributeError):
        return True


def _rotate(v, axis, deg):
    """Rodrigues rotation of ``v`` around unit ``axis`` by ``deg``."""
    axis = axis / np.linalg.norm(axis).clip(1e-12)
    th = np.deg2rad(deg)
    return (
        v * np.cos(th)
        + np.cross(axis, v) * np.sin(th)
        + axis * np.dot(axis, v) * (1.0 - np.cos(th))
    )


class CameraRig:
    """Mutable camera state + the reference camera it can reset to."""

    def __init__(self, camera):
        self._camera0 = camera
        self.reset()

    def reset(self):
        c = self._camera0
        self.position = np.asarray(c.position, np.float64).copy()
        self.view = np.asarray(c.view, np.float64).copy()
        self.up = np.asarray(c.up, np.float64).copy()
        self.fov = np.asarray(c.fov, np.float64).copy()

    @property
    def _basis(self):
        fwd = self.view / np.linalg.norm(self.view).clip(1e-12)
        right = np.cross(fwd, self.up)
        right /= np.linalg.norm(right).clip(1e-12)
        return fwd, right

    def apply(self, cmd: str) -> bool:
        """Apply one movement command; True if the camera changed."""
        step = MOVE_FRAC * np.linalg.norm(self.view)
        fwd, right = self._basis
        if cmd == "w":
            self.position += step * fwd
        elif cmd == "s":
            self.position -= step * fwd
        elif cmd == "a":
            self.position -= step * right
        elif cmd == "d":
            self.position += step * right
        elif cmd == "q":
            self.position -= step * self.up / np.linalg.norm(self.up).clip(1e-12)
        elif cmd == "e":
            self.position += step * self.up / np.linalg.norm(self.up).clip(1e-12)
        elif cmd == "i":
            self.view = _rotate(self.view, right, ROT_DEG)
        elif cmd == "k":
            self.view = _rotate(self.view, right, -ROT_DEG)
        elif cmd == "j":
            self.view = _rotate(self.view, self.up, ROT_DEG)
        elif cmd == "l":
            self.view = _rotate(self.view, self.up, -ROT_DEG)
        elif cmd == "+":
            self.fov = np.maximum(self.fov - ZOOM_DEG, 5.0)
        elif cmd == "-":
            self.fov = np.minimum(self.fov + ZOOM_DEG, 85.0)
        else:
            return False
        return True

    def camera(self, base):
        """The rig state as a Camera pytree (same treedef as ``base``)."""
        import jax.numpy as jnp

        return dataclasses.replace(
            base,
            position=jnp.asarray(self.position, jnp.float32),
            view=jnp.asarray(self.view, jnp.float32),
            up=jnp.asarray(self.up, jnp.float32),
            fov=jnp.asarray(self.fov, jnp.float32),
        )

    def describe(self) -> str:
        p, v = self.position, self.view
        return (
            f"eye=({p[0]:.2f}, {p[1]:.2f}, {p[2]:.2f}) "
            f"view=({v[0]:.2f}, {v[1]:.2f}, {v[2]:.2f}) fovy={self.fov[1]:.1f}"
        )


def interactive_loop(
    desc,
    frame: int,
    cfg,
    preview_spp: int = 16,
    out_path: str = "renders/interactive.png",
    full_spp: int | None = None,
    stdin=None,
    stdout=None,
    max_commands: int | None = None,
):
    """Run the REPL.  ``stdin``/``stdout`` injectable for tests."""
    import jax

    from pathtracer_tpu.render.integrator import render
    from pathtracer_tpu.utils.imageio import save_image

    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    scene = desc.scene_for_frame(frame)
    rig = CameraRig(scene.camera)
    full_spp = full_spp or desc.iterations
    w, h = scene.camera.width, scene.camera.height
    n_renders = 0

    def emit(msg):
        print(msg, file=stdout, flush=True)

    # progressive preview state: (sum accumulator, samples done, last
    # 8-bit frame written) for the CURRENT camera — any move resets it,
    # idle time refines it
    prog = {"accum": None, "spp": 0, "png8": None}

    def refine_chunk():
        """Accumulate one more preview_spp chunk and rewrite the PNG
        (skipped when the refinement is below 8-bit quantization — no
        point re-encoding an identical frame)."""
        nonlocal n_renders
        cam = rig.camera(scene.camera)
        sc = dataclasses.replace(scene, camera=cam)
        t0 = time.perf_counter()
        img, accum, _ = render(
            sc,
            preview_spp,
            cfg,
            base_key=jax.random.PRNGKey(cfg.seed),
            accum=prog["accum"],
            start_iteration=prog["spp"],
        )
        jax.block_until_ready(img)
        prog["accum"] = accum
        prog["spp"] += preview_spp
        img8 = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
        if prog["png8"] is None or not np.array_equal(img8, prog["png8"]):
            path = save_image(out_path, np.asarray(img))
            prog["png8"] = img8
        else:
            path = out_path  # frame unchanged at 8 bits: write elided
        n_renders += 1
        return path, time.perf_counter() - t0

    def preview():
        prog["accum"] = None
        prog["spp"] = 0
        path, dt = refine_chunk()
        emit(f"  [{rig.describe()}] {prog['spp']} spp in {dt:.2f}s -> {path}")

    emit(f"[interactive] {w}x{h}, preview {preview_spp} spp — 'help' for keys")
    preview()
    n_cmds = 0
    while True:
        # progressive-while-idle: keep refining the preview until input
        # arrives or the scene's iteration budget is reached.  The 50 ms
        # select timeout between chunks is the backoff: the loop yields
        # the core while waiting for input instead of busy-spinning
        # (reference redraws per display tick, not at 100% duty —
        # src/main.cpp:201-218)
        while prog["spp"] < full_spp and not _input_pending(stdin, 0.05):
            refine_chunk()
            if max_commands is not None and n_renders > max_commands + 64:
                break  # safety valve for driverless test rigs
        line = stdin.readline()
        if not line:
            break
        tokens = line.split()
        i = 0
        while i < len(tokens):
            cmd = tokens[i]
            i += 1
            n_cmds += 1
            if max_commands is not None and n_cmds > max_commands:
                return n_renders
            cmd_l = cmd.lower()
            # two-token forms ("spp 32", "save out.png") fold the next
            # token into the command; '=' forms stay supported
            if cmd_l == "spp" and i < len(tokens):
                cmd_l = f"spp={tokens[i]}"
                i += 1
            elif cmd_l == "refine" and i < len(tokens):
                cmd_l = f"refine={tokens[i]}"
                i += 1
            elif cmd_l == "save" and i < len(tokens) and tokens[i].lower() not in _COMMANDS:
                # "save [f]": the filename is optional — only consume the
                # next token when it isn't itself a command
                cmd_l = f"save={tokens[i]}"
                i += 1
            if cmd_l in ("quit", "exit", "\x1b"):
                return n_renders
            if cmd_l == "help":
                emit(HELP)
            elif cmd_l == "stat":
                emit("  " + rig.describe())
            elif cmd_l == "reset":
                rig.reset()
                preview()
            elif cmd_l.startswith("refine"):
                try:
                    n_chunks = int(cmd_l.split("=", 1)[1]) if "=" in cmd_l else 1
                except ValueError:
                    emit(f"  ? refine wants a number, got {cmd_l.split('=', 1)[1]!r}")
                    continue
                for _ in range(max(1, n_chunks)):
                    path, dt = refine_chunk()
                emit(f"  refined to {prog['spp']} spp -> {path}")
            elif cmd_l.startswith("spp="):
                try:
                    preview_spp = max(1, int(cmd_l.split("=", 1)[1]))
                    emit(f"  preview spp = {preview_spp}")
                except ValueError:
                    emit(f"  ? spp wants a number, got {cmd_l.split('=', 1)[1]!r}")
            elif cmd_l.startswith("save"):
                target = (
                    cmd_l.split("=", 1)[1] if "=" in cmd_l else out_path
                ).replace(".png", ".full.png")
                cam = rig.camera(scene.camera)
                sc = dataclasses.replace(scene, camera=cam)
                t0 = time.perf_counter()
                img, _, _ = render(
                    sc, full_spp, cfg, base_key=jax.random.PRNGKey(cfg.seed)
                )
                jax.block_until_ready(img)
                path = save_image(target, np.asarray(img))
                n_renders += 1
                emit(f"  saved {path} ({full_spp} spp, {time.perf_counter()-t0:.1f}s)")
            elif rig.apply(cmd_l):
                preview()
            else:
                emit(f"  ? unknown command {cmd!r} — 'help' for keys")
    return n_renders
