"""Trace ONLY the grad step and dump per-op device times (TPU)."""

import dataclasses
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import _trim, params_from_description, render_linear_rays
from pathtracer_tpu.scene.parser import load_scene


def main():
    res = (800, 800)
    gspp = 4
    desc = load_scene("scenes/cornell.txt")
    desc = dataclasses.replace(desc, resolution=res)
    params, static = params_from_description(desc, 0)
    cfg = _trim(RenderConfig(wavefront=False, nee=True, max_depth=8), params)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((res[0] * res[1], 3), jnp.float32)

    def loss(p):
        img, rays = render_linear_rays(p, static, gspp, key, cfg)
        return jnp.mean((img - target) ** 2), rays

    fn = jax.jit(jax.value_and_grad(loss, has_aux=True))
    out = fn(params)
    jax.block_until_ready(out[0][0])
    t0 = time.perf_counter()
    out = fn(params)
    jax.block_until_ready(out[0][0])
    print(f"step: {(time.perf_counter()-t0)*1e3:.1f} ms")

    os.system("rm -rf /tmp/jaxtrace")
    with jax.profiler.trace("/tmp/jaxtrace"):
        out = fn(params)
        jax.block_until_ready(out[0][0])

    pb = glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True)
    if not pb:
        print("no xplane.pb produced (CPU backend?)")
        return
    summarize(pb[0])


def summarize(pb_path, top=30):
    """Aggregate leaf XLA-op device time by (fusion-name-prefix, opcode).

    The xplane schema ships with the baked-in tensorflow wheel; while/call
    wrapper events (which span their children) are skipped so the totals
    are leaf time, comparable to the measured step wall time."""
    import collections
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(pb_path, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        print("no TPU plane in trace")
        return
    plane = planes[0]
    emeta = {m.id: m.name for m in plane.event_metadata.values()}
    opre = re.compile(r"^%?([\w.\-]+) = \S+ (\w+)\(")
    agg, cnt = collections.Counter(), collections.Counter()
    total = 0.0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = emeta.get(ev.metadata_id, "?")
            m = opre.match(name)
            if m is None:
                continue  # tuple-typed wrappers (while/conditional bodies)
            opname, opcode = m.group(1), m.group(2)
            if opcode in ("while", "call", "conditional"):
                continue
            dur = ev.duration_ps / 1e9  # ms
            key = re.sub(r"[.\d]+$", "", opname) + ":" + opcode
            agg[key] += dur
            cnt[key] += 1
            total += dur
    print(f"leaf device time: {total:.1f} ms")
    for k, ms in agg.most_common(top):
        print(f"{ms:9.2f} ms  {100 * ms / total:5.1f}%  n={cnt[k]:5d}  {k}")


if __name__ == "__main__":
    main()
