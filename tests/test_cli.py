"""Console entry point (`cbinfer`, cbinfer_tpu/cli.py).

README and pyproject [project.scripts] advertise the CLI; these tests keep
the argument wiring, the synthetic and file-video paths, and the JSON
output contract covered on CPU (jnp backend, tiny shapes). The reference's
equivalent surface is its argparse demo/eval scripts (SURVEY.md C16/C19).
"""

import json

import numpy as np

from cbinfer_tpu.cli import main


def _run_cli(capsys, argv):
    main(argv)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    # --json prints exactly one line; without it the stats table follows.
    return json.loads(lines[0])


def test_cli_synthetic_json(capsys):
    out = _run_cli(capsys, [
        "--model", "scene", "--width-mult", "16", "--classes", "4",
        "--height", "48", "--width", "64", "--frames", "4",
        "--backend", "jnp", "--json"])
    assert out["model"] == "scene" and out["backend"] == "jnp"
    # identical math at tau=0.04 on a 4-frame clip: argmax maps agree
    assert out["miou_vs_dense"] > 0.98
    assert out["flop_reduction"] > 1.0
    assert len(out["thresholds"]) > 0


def test_cli_live_mode(capsys):
    """--live K runs the FrameStepper micro-batch path and reports a
    per-frame wall time alongside the scan-form results."""
    out = _run_cli(capsys, [
        "--model", "scene", "--width-mult", "16", "--classes", "4",
        "--height", "48", "--width", "64", "--frames", "8",
        "--backend", "jnp", "--live", "4", "--json"])
    assert out["live_chunk"] == 4
    assert out["live_ms_per_frame"] > 0
    assert out["miou_vs_dense"] > 0.98


def test_cli_npz_video_and_stats_table(capsys, tmp_path):
    clip = (np.random.default_rng(0)
            .random((4, 48, 64, 3), dtype=np.float32))
    path = tmp_path / "clip.npz"
    np.savez(path, frames=clip)
    out = _run_cli(capsys, [
        "--model", "scene", "--width-mult", "16", "--classes", "4",
        "--frames", "4", "--backend", "jnp", "--video", str(path)])
    assert out["model"] == "scene"
    assert isinstance(out["flop_reduction"], float)
