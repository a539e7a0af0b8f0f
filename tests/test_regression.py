"""Trajectory regression fixtures (SURVEY §4f).

Freezes the prognostic fields of a short canonical run; any future change
to operators, advection, forcing, or stepping that alters trajectories
beyond roundoff fails here. Regenerate deliberately with:

    python -m tests.test_regression   # rewrites tests/fixtures/*.npz
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")

CASES = {
    "jacobian_64": dict(name="64x64_two_Gaussians_high_B",
                        formulation="vector_invariant", steps=50, dt=0.01),
    "divergence_64": dict(name="64x64_two_Gaussians_high_B",
                          formulation="conservative", steps=50, dt=0.01),
}


def _run(case):
    from swmhd_tpu import scenarios
    model, state, _ = scenarios.build(case["name"], case["formulation"],
                                      dtype=jnp.float64)
    out = jax.jit(model.step_fn(case["dt"], case["steps"]))(state)
    return {k: np.asarray(getattr(out, k)) for k in ("h", "u", "v", "A")}


@pytest.mark.parametrize("key", sorted(CASES))
def test_trajectory_regression(key):
    path = os.path.join(FIXTURE_DIR, f"{key}.npz")
    if not os.path.exists(path):
        pytest.skip(f"fixture {path} missing — regenerate via "
                    f"python -m tests.test_regression")
    want = np.load(path)
    got = _run(CASES[key])
    for name in ("h", "u", "v", "A"):
        np.testing.assert_allclose(
            got[name], want[name], rtol=1e-12, atol=1e-13,
            err_msg=f"{key}:{name} trajectory drifted")


def regenerate():
    # must match the test environment: CPU backend, float64
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for key, case in CASES.items():
        fields = _run(case)
        np.savez_compressed(os.path.join(FIXTURE_DIR, f"{key}.npz"),
                            **fields)
        print("wrote", key, {k: v.shape for k, v in fields.items()})


if __name__ == "__main__":
    regenerate()
