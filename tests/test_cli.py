"""CLI product-surface tests — including the multi-device entry point.

The reference wires its device binding directly into the app entry
(``src/main.cpp:296-305``); the framework equivalent is ``--sharded``:
``initialize_distributed()`` + a 1-D mesh + ``render_sharded``, with
preview/checkpoint/resume working (VERDICT r2 top item).  Runs on the
8-virtual-device CPU mesh (conftest).
"""

import os
import re

import numpy as np
import pytest

from pathtracer_tpu import cli
from pathtracer_tpu.utils.imageio import load_png


@pytest.fixture(scope="module")
def small_scene(tmp_path_factory):
    src = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt")
    text = open(src).read()
    text = re.sub(r"RES\s+\d+\s+\d+", "RES 32 32", text)
    path = tmp_path_factory.mktemp("scenes") / "cornell_small.txt"
    path.write_text(text)
    return str(path)


def _run(small_scene, tmp, name, extra):
    out = str(tmp / f"{name}.png")
    rc = cli.main(
        [f"scene={small_scene}", "--spp", "16", "--depth", "5", "--out", out]
        + extra
    )
    assert rc == 0
    return load_png(str(tmp / f"{name}.0.png"))


def test_cli_sharded_matches_single_device(small_scene, tmp_path):
    """The documented launch incantation works end-to-end and reproduces
    the single-device image (same sample set; <=1 8-bit quantum)."""
    img1 = _run(small_scene, tmp_path, "single", [])
    img8 = _run(small_scene, tmp_path, "sharded", ["--sharded"])
    assert img1.shape == (32, 32, 3)
    assert np.abs(img1.astype(int) - img8.astype(int)).max() <= 1


def test_cli_sharded_checkpoint_roundtrip(small_scene, tmp_path):
    """Sharded render checkpointed mid-way resumes to the exact image an
    uninterrupted run produces (deterministic fold_in keying)."""
    ck = str(tmp_path / "state.npz")
    out_a = str(tmp_path / "direct.png")
    out_b = str(tmp_path / "resumed.png")

    rc = cli.main(
        [f"scene={small_scene}", "--spp", "16", "--depth", "5",
         "--out", out_a, "--sharded"]
    )
    assert rc == 0

    # first 8 spp, checkpointing
    rc = cli.main(
        [f"scene={small_scene}", "--spp", "8", "--depth", "5",
         "--out", str(tmp_path / "partial.png"), "--sharded",
         "--checkpoint", ck, "--checkpoint-every", "8"]
    )
    assert rc == 0 and os.path.exists(ck)

    # resume to 16 spp from the checkpoint
    rc = cli.main(
        [f"scene={small_scene}", "--spp", "16", "--depth", "5",
         "--out", out_b, "--sharded", "--checkpoint", ck]
    )
    assert rc == 0

    a = load_png(str(tmp_path / "direct.0.png"))
    b = load_png(str(tmp_path / "resumed.0.png"))
    np.testing.assert_array_equal(a, b)


def test_cli_checkpoint_crosses_layouts(small_scene, tmp_path):
    """A single-device checkpoint resumes on the 8-device mesh (pixel-
    ordered persistence is layout-independent)."""
    ck = str(tmp_path / "state1.npz")
    rc = cli.main(
        [f"scene={small_scene}", "--spp", "8", "--depth", "5",
         "--out", str(tmp_path / "p.png"),
         "--checkpoint", ck, "--checkpoint-every", "8"]
    )
    assert rc == 0 and os.path.exists(ck)
    rc = cli.main(
        [f"scene={small_scene}", "--spp", "16", "--depth", "5",
         "--out", str(tmp_path / "x.png"), "--sharded", "--checkpoint", ck]
    )
    assert rc == 0
    rc = cli.main(
        [f"scene={small_scene}", "--spp", "16", "--depth", "5",
         "--out", str(tmp_path / "y.png")]
    )
    assert rc == 0
    x = load_png(str(tmp_path / "x.0.png"))
    y = load_png(str(tmp_path / "y.0.png"))
    assert np.abs(x.astype(int) - y.astype(int)).max() <= 1


def test_cli_sharded_rejects_interactive(small_scene):
    with pytest.raises(SystemExit):
        cli.main([f"scene={small_scene}", "--sharded", "--interactive"])


def test_cli_resume_on_failure(small_scene, tmp_path, monkeypatch):
    """Failure detection -> auto-resume (SURVEY §5): a chunk that raises
    mid-render is retried from the last good checkpoint; the final image
    equals an uninterrupted run's exactly (deterministic fold_in keys)."""
    import importlib

    integ = importlib.import_module("pathtracer_tpu.render.integrator")
    from pathtracer_tpu.utils import checkpoint as ckpt

    ck = str(tmp_path / "state.npz")
    real_render = integ.render
    calls = {"n": 0}

    def flaky_render(scene, spp, cfg, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # render the first 8 spp for real (progress checkpoints at 8),
            # then die — a transient fault after a good checkpoint
            _, acc, _ = real_render(scene, 8, cfg, **kw)
            kw["progress_fn"](8, acc)
            raise RuntimeError("injected transient fault")
        return real_render(scene, spp, cfg, **kw)

    monkeypatch.setattr(integ, "render", flaky_render)
    rc = cli.main(
        [f"scene={small_scene}", "--spp", "16", "--depth", "5",
         "--out", str(tmp_path / "flaky.png"),
         "--checkpoint", ck, "--checkpoint-every", "8",
         "--resume-on-failure"]
    )
    assert rc == 0
    assert calls["n"] == 2  # one failure, one clean resume
    # the retry resumed FROM THE CHECKPOINT, not from scratch
    state = ckpt.load(ck)
    assert state is not None and int(state["spp_done"]) >= 8
    monkeypatch.setattr(integ, "render", real_render)
    rc = cli.main(
        [f"scene={small_scene}", "--spp", "16", "--depth", "5",
         "--out", str(tmp_path / "clean.png")]
    )
    assert rc == 0
    a = load_png(str(tmp_path / "flaky.0.png"))
    b = load_png(str(tmp_path / "clean.0.png"))
    np.testing.assert_array_equal(a, b)


def test_cli_failure_without_flag_raises(small_scene, tmp_path, monkeypatch):
    """Without --resume-on-failure the error propagates (no silent retry)."""
    import importlib

    integ = importlib.import_module("pathtracer_tpu.render.integrator")

    def dead_render(*a, **kw):
        raise RuntimeError("injected fault")

    monkeypatch.setattr(integ, "render", dead_render)
    with pytest.raises(RuntimeError, match="injected fault"):
        cli.main(
            [f"scene={small_scene}", "--spp", "8", "--depth", "5",
             "--out", str(tmp_path / "x.png")]
        )


def test_cli_deterministic_failure_exhausts_retries(small_scene, tmp_path, monkeypatch):
    """A failure that recurs every attempt (e.g. NaN physics under
    --debug) re-raises after MAX_FAILURE_RETRIES instead of looping."""
    import importlib

    integ = importlib.import_module("pathtracer_tpu.render.integrator")

    calls = {"n": 0}

    def dead_render(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("deterministic NaN")

    monkeypatch.setattr(integ, "render", dead_render)
    with pytest.raises(RuntimeError, match="deterministic NaN"):
        cli.main(
            [f"scene={small_scene}", "--spp", "8", "--depth", "5",
             "--out", str(tmp_path / "x.png"), "--resume-on-failure"]
        )
    assert calls["n"] == 1 + cli.MAX_FAILURE_RETRIES
