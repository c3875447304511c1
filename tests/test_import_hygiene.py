"""Imports must not initialize a jax backend.

A module-level jax op (e.g. a jnp constant) initializes the DEFAULT
backend at import time — before any CLI/entry-point platform forcing
runs.  On this image the default is the remote TPU plugin: when its
terminal is unreachable, every `import deftet_tpu.train` hangs in a
connection backoff (this shipped once — check_sign.py's _JITTER).

Runs in a subprocess so the check is not satisfied by conftest's own
early backend initialization.
"""

import subprocess
import sys


def test_imports_do_not_initialize_backend():
    code = (
        "import deftet_tpu.cli, deftet_tpu.train, deftet_tpu.evals,"
        " deftet_tpu.render.optimize, deftet_tpu.nn, deftet_tpu.ops,"
        " deftet_tpu.losses, deftet_tpu.data.pipeline\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'backend initialized: {xb._backends}'\n"
        "print('clean')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "clean" in out.stdout
