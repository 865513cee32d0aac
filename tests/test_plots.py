"""scripts/plot_results.py renders the artifact figures (CB19 SS VI parity)."""
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_plot_results_renders(tmp_path):
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "plot_results.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    pngs = sorted(p.name for p in tmp_path.glob("*.png"))
    # The repo always carries RESULTS.json + TUNE_*.json, so at minimum the
    # speedup chart, the Pareto front, and one sensitivity figure render.
    assert "speedup.png" in pngs
    assert "pareto.png" in pngs
    assert any(n.startswith("sensitivity_") for n in pngs)
    assert all((tmp_path / n).stat().st_size > 5000 for n in pngs)
