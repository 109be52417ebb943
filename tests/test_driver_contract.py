"""The external driver contract: bench.py's JSON line and __graft_entry__.

The round driver runs `python bench.py` (expects exactly one JSON object on
stdout with metric/value/unit/vs_baseline) and imports `__graft_entry__` for
`entry()` (jittable single-chip forward) and `dryrun_multichip(n)` (full
sharded step on an n-device mesh). Breaking either silently voids the round's
recorded benchmark, so they are pinned here on the fake 8-device CPU mesh.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_prints_one_json_line():
    env = dict(os.environ, DEPTHRENDERER_PLATFORM="cpu",
               JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--density", "4", "--width", "128", "--height", "96",
         "--frames", "2", "--frame-batch", "2", "--reps", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got: {lines}"
    rec = json.loads(lines[0])
    # The canonical driver keys must be present; extra diagnostic keys
    # (impl, quality PSNRs) ship beside them so speed and fidelity stay in
    # one artifact.
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
    assert rec["unit"] == "frames/s"


def test_graft_entry_and_multichip_dryrun():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as graft
    finally:
        sys.path.pop(0)

    import jax

    fn, args = graft.entry()
    shape = jax.eval_shape(fn, *args)
    assert shape.shape[-1] == 4 and shape.dtype.name == "uint8"

    # conftest provides the fake 8-device CPU mesh.
    graft.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions():
    """The driver calls dryrun_multichip in the DEFAULT env (no JAX_PLATFORMS=cpu,
    no xla_force_host_platform_device_count) — round 1's artifact was red because
    the function assumed the caller pre-provisioned the mesh. Run it in a clean
    subprocess with every provisioning variable scrubbed."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "DEPTHRENDERER_PLATFORM")
    }
    # Keep tests off the real TPU tunnel even though the function itself forces
    # CPU: belt and braces via the compilation cache only (no platform vars).
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('ok')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok" in out.stdout
