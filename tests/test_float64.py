"""float64 dtype policy: the whole pipeline must run and stay accurate with
x64 enabled (round-1 review item 7: the dtype knob existed but was never
exercised).

x64 is a process-global JAX flag, so the run happens in a subprocess — the
main test process keeps the suite's float32 compile cache intact.
"""

import json
import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent(
    """
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import json
    import jax.numpy as jnp
    import numpy as np

    from tempest_tpu import Sampler
    from tempest_tpu.state import mis_denominator, mis_denominator_exact

    n_dim = 4

    def prior_transform(u):
        return 20.0 * u - 10.0

    def log_likelihood(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - 0.5 * n_dim * jnp.log(2 * jnp.pi)

    s = Sampler(
        prior_transform,
        log_likelihood,
        n_dim=n_dim,
        n_particles=256,
        vectorize=True,
        clustering=False,
        random_state=1,
        dtype=jnp.float64,
    )
    s.run(n_total=1024, progress=False)

    hist = s.state.hist
    # Incremental MIS accumulator must agree with the exact O(S*T) rebuild
    # at double precision.
    d_inc = np.asarray(mis_denominator(hist))
    d_exact = np.asarray(mis_denominator_exact(hist))
    valid = np.asarray(hist.sample_mask())
    mis_err = float(np.max(np.abs(d_inc[valid] - d_exact[valid])))

    logz, _ = s.evidence()
    print(
        json.dumps(
            {
                "dtype_u": str(hist.u.dtype),
                "dtype_logl": str(hist.logl.dtype),
                "logz": float(logz),
                "analytic": float(-n_dim * np.log(20.0)),
                "mis_err": mis_err,
                "beta": float(s.beta),
            }
        )
    )
    """
)


def test_float64_end_to_end():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["dtype_u"] == "float64"
    assert out["dtype_logl"] == "float64"
    assert out["beta"] > 0.99
    # 4-D standard Gaussian in U(-10,10)^4: logZ = -4 log 20
    assert abs(out["logz"] - out["analytic"]) < 0.35, out
    # Double-precision accumulator vs exact rebuild: tight agreement
    assert out["mis_err"] < 1e-9, out
