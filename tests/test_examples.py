"""The examples/ scripts stay runnable (CPU, small N)."""
import pathlib
import subprocess
import sys


def test_register_pair_quickstart_runs():
    root = pathlib.Path(__file__).resolve().parents[1]
    # run in-process-style via subprocess so argparse/__main__ is exercised;
    # force CPU before any jax import (env JAX_PLATFORMS is ignored here —
    # sitecustomize pins the axon plugin — so go through jax.config)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv=['register_pair.py','--n','256'];"
        f"exec(open(r'{root / 'examples' / 'register_pair.py'}').read())"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=root,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "rotation error" in out.stdout, out.stdout


def test_register_pair_robust_flag_runs():
    root = pathlib.Path(__file__).resolve().parents[1]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv=['register_pair.py','--n','256','--robust'];"
        f"exec(open(r'{root / 'examples' / 'register_pair.py'}').read())"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=root,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "rotation error" in out.stdout, out.stdout


def test_denoise_demo_runs():
    root = pathlib.Path(__file__).resolve().parents[1]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv=['denoise.py','--steps','6','--n','64','--k','8'];"
        f"exec(open(r'{root / 'examples' / 'denoise.py'}').read())"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=root,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]


def test_multihost_train_demo_runs():
    root = pathlib.Path(__file__).resolve().parents[1]
    import os
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # the demo's workers provision their own CPUs
    out = subprocess.run(
        [sys.executable, str(root / "examples" / "multihost_train.py"),
         "--demo"],
        cwd=root, capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "both processes finished" in out.stdout, out.stdout


def test_global_registration_demo_runs():
    root = pathlib.Path(__file__).resolve().parents[1]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv=['global_registration.py','--n-points','512'];"
        f"exec(open(r'{root / 'examples' / 'global_registration.py'}').read())"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=root,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "vs ground truth" in out.stdout, out.stdout
    # the full-overlap default recovers well under a degree
    err = float(out.stdout.rsplit("vs ground truth:", 1)[1].split("deg")[0])
    assert err < 1.0, out.stdout


def test_multiway_registration_demo_runs():
    root = pathlib.Path(__file__).resolve().parents[1]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv=['multiway_registration.py',"
        "'--fragments','5','--n-points','768'];"
        f"exec(open(r'{root / 'examples' / 'multiway_registration.py'}').read())"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=root,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    chain = float(out.stdout.split("odometry chain : max")[1].split("deg")[0])
    opt = float(out.stdout.split("optimized graph: max")[1].split("deg")[0])
    assert chain > 3.0, out.stdout      # the injected corruption is visible
    assert opt < chain / 4, out.stdout  # and the robust graph repairs it
