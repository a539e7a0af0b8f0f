"""Fused Pallas RK3 substage == reference XLA step (interpret mode on CPU).

Validates both the kernel logic and the SUBSTAGE_RADIUS halo budget: if the
composed stencil radius of one tendency evaluation exceeded the per-substage
halo, the tile borders would diverge from the global-roll path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swmhd_tpu import (
    Grid, ShallowWaterModel, FPlane, VECTOR_INVARIANT, CONSERVATIVE,
    jacobian_lorentz_forcing, divergence_lorentz_forcing,
)
from swmhd_tpu.ops.fused_step import fused_step_fn

L = 10.0


def build(formulation, N=64):
    g = Grid.regular(N, N, (-L / 2, L / 2), (-L / 2, L / 2),
                     dtype=jnp.float64)
    forcing = (jacobian_lorentz_forcing()
               if formulation == VECTOR_INVARIANT
               else divergence_lorentz_forcing())
    model = ShallowWaterModel(grid=g, formulation=formulation,
                              coriolis=FPlane(1.0), forcing=forcing)
    state = model.initial_state(
        u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
        h=lambda x, y: 1.0 + 0.05 * jnp.exp(-(x**2 + y**2)),
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
        - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))
    return model, state


@pytest.mark.parametrize("formulation", [VECTOR_INVARIANT, CONSERVATIVE])
def test_fused_matches_reference_step(formulation):
    model, state = build(formulation, N=64)
    dt = 0.01
    ref = jax.jit(model.step_fn(dt, 2))(state)
    fused = fused_step_fn(model, dt, n_steps=2, tile_x=32, halo=8,
                          interpret=True)
    out = fused(state)
    for name in ("h", "u", "v", "A"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=1e-12, err_msg=f"{name} ({formulation})")
    assert float(out.clock.time) == pytest.approx(float(ref.clock.time))


def test_fused_multi_tile():
    """More than one tile in each direction exercises the DMA windowing."""
    model, state = build(VECTOR_INVARIANT, N=96)
    dt = 0.005
    ref = jax.jit(model.step_fn(dt, 1))(state)
    fused = fused_step_fn(model, dt, n_steps=1, tile_x=48, halo=8,
                          interpret=True)
    out = fused(state)
    for name in ("h", "u", "v", "A"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=1e-12, err_msg=name)


def test_fused_four_tiles_steady_state_dma():
    """>= 4 x-windows so the double-buffered DMA pipeline's steady-state
    branches run: the (i >= 2) write-wait and the 0 < i < last prefetch
    never execute with only 2 tiles (advisor r2 finding) — an off-by-one
    in semaphore accounting there would ship undetected."""
    model, state = build(VECTOR_INVARIANT, N=128)
    dt = 0.005
    ref = jax.jit(model.step_fn(dt, 1))(state)
    fused = fused_step_fn(model, dt, n_steps=1, tile_x=32, halo=8,
                          interpret=True)
    out = fused(state)
    for name in ("h", "u", "v", "A"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=1e-12, err_msg=name)


@pytest.mark.parametrize("formulation", [VECTOR_INVARIANT, CONSERVATIVE])
def test_fused_bounded_y_matches_reference_step(formulation):
    """Bounded-y walls inside the fused kernel (the reference's
    low_B_low_U scenario class, SWMHD_example.jl:18-19): the kernel holds
    the full y row, so the roll+where+iota wall machinery (clamped
    shifts, wall-flux zeroing, no-penetration masks, near-wall WENO
    degradation) is exact in-kernel — this test pins fused == XLA on a
    wall-bounded run with the scenario's background-gradient A."""
    from swmhd_tpu import scenarios
    model, state, sc = scenarios.build("64x64_low_B_low_U", formulation,
                                       dtype=jnp.float64)
    dt = sc.dt
    ref = jax.jit(model.step_fn(dt, 2))(state)
    fused = fused_step_fn(model, dt, n_steps=2, tile_x=32, halo=8,
                          interpret=True)
    out = fused(state)
    for name in ("h", "u", "v", "A"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=1e-12,
            err_msg=f"bounded-y fused {name} ({formulation})")


def test_fused_bounded_x_rejected():
    g = Grid.regular(64, 64, (-L / 2, L / 2), (-L / 2, L / 2),
                     topology=("bounded", "periodic"), dtype=jnp.float64)
    model = ShallowWaterModel(grid=g, formulation=VECTOR_INVARIANT,
                              coriolis=FPlane(1.0))
    with pytest.raises(ValueError, match="periodic x"):
        fused_step_fn(model, 0.01, interpret=True)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU fused==XLA equality (VERDICT r2 item 6)")
@pytest.mark.parametrize("mosaic_roll", ["0", "1"])
def test_fused_matches_xla_on_tpu(monkeypatch, mosaic_roll):
    """f32-roundoff agreement of the compiled fused path against the XLA
    path on actual hardware, over 10 steps at 256^2, for both roll
    lowerings — so the bench path is continuously verified on the
    hardware it benches."""
    monkeypatch.setenv("SWMHD_MOSAIC_ROLL", mosaic_roll)
    g = Grid.regular(256, 256, (-L / 2, L / 2), (-L / 2, L / 2),
                     dtype=jnp.float32)
    model = ShallowWaterModel(grid=g, formulation=VECTOR_INVARIANT,
                              coriolis=FPlane(1.0),
                              forcing=jacobian_lorentz_forcing())
    state = model.initial_state(
        u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
        h=lambda x, y: 1.0 + 0.05 * jnp.exp(-(x**2 + y**2)),
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
        - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))
    dt = 0.005
    ref = jax.jit(model.step_fn(dt, 10))(state)
    out = jax.jit(fused_step_fn(model, dt, n_steps=10))(state)
    for name in ("h", "u", "v", "A"):
        a = np.asarray(getattr(out, name), dtype=np.float64)
        b = np.asarray(getattr(ref, name), dtype=np.float64)
        scale = np.max(np.abs(b)) + 1e-30
        assert np.max(np.abs(a - b)) / scale < 2e-5, (
            f"{name}: fused deviates from XLA on TPU by "
            f"{np.max(np.abs(a - b)) / scale:.2e} (mosaic_roll="
            f"{mosaic_roll})")


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU bounded-y fused==XLA equality")
def test_fused_bounded_y_matches_xla_on_tpu():
    """Compiled (Mosaic) agreement of the bounded-y wall machinery over
    10 steps at 128^2 f32 — guards the where+iota lowering on hardware."""
    from swmhd_tpu import scenarios
    model, state, sc = scenarios.build("128x128_low_B_low_U",
                                       VECTOR_INVARIANT,
                                       dtype=jnp.float32)
    dt = sc.dt
    ref = jax.jit(model.step_fn(dt, 10))(state)
    out = jax.jit(fused_step_fn(model, dt, n_steps=10))(state)
    for name in ("h", "u", "v", "A"):
        a = np.asarray(getattr(out, name), dtype=np.float64)
        b = np.asarray(getattr(ref, name), dtype=np.float64)
        scale = np.max(np.abs(b)) + 1e-30
        assert np.max(np.abs(a - b)) / scale < 2e-5, (
            f"{name}: bounded-y fused deviates from XLA on TPU by "
            f"{np.max(np.abs(a - b)) / scale:.2e}")


class TestResident:
    """resident_step_fn: whole-state-in-VMEM multi-step kernel (the 512²
    ladder rung fix, VERDICT r3 item 4) == the XLA step, all topologies."""

    @pytest.mark.parametrize("formulation", [VECTOR_INVARIANT, CONSERVATIVE])
    def test_resident_matches_reference_step(self, formulation):
        from swmhd_tpu.ops.fused_step import resident_step_fn
        model, state = build(formulation, N=64)
        dt = 0.01
        ref = jax.jit(model.step_fn(dt, 3))(state)
        out = resident_step_fn(model, dt, n_steps=3, interpret=True)(state)
        for name in ("h", "u", "v", "A"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)),
                rtol=1e-12, atol=1e-12, err_msg=f"{name} ({formulation})")
        assert float(out.clock.time) == pytest.approx(float(ref.clock.time))
        assert int(out.clock.iteration) == 3

    @pytest.mark.parametrize("topology", [("periodic", "bounded"),
                                          ("bounded", "bounded")])
    def test_resident_bounded_topologies(self, topology):
        """Full arrays resident => wall machinery exact in BOTH axes —
        topologies the windowed kernel cannot run (bounded x)."""
        from swmhd_tpu.ops.fused_step import resident_step_fn
        g = Grid.regular(64, 64, (-L / 2, L / 2), (-L / 2, L / 2),
                         topology=topology, dtype=jnp.float64)
        model = ShallowWaterModel(grid=g, formulation=VECTOR_INVARIANT,
                                  coriolis=FPlane(1.0),
                                  forcing=jacobian_lorentz_forcing())
        state = model.initial_state(
            u=lambda x, y: 0.2 * jnp.sin(jnp.pi * x / 5)
            * jnp.sin(jnp.pi * y / 5),
            h=lambda x, y: 1.0 + 0.05 * jnp.exp(-(x**2 + y**2)),
            A=lambda x, y: 0.5 * jnp.exp(-(x**2 + y**2)))
        dt = 0.005
        ref = jax.jit(model.step_fn(dt, 2))(state)
        out = resident_step_fn(model, dt, n_steps=2, interpret=True)(state)
        for name in ("h", "u", "v", "A"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)),
                rtol=1e-12, atol=1e-12, err_msg=f"{name} {topology}")

    def test_resident_with_diagnostics_series(self):
        from swmhd_tpu.ops.fused_step import resident_step_fn
        model, state = build(VECTOR_INVARIANT, N=64)
        dt = 0.01

        def diag(s):
            return {"mass": jnp.sum(s.h)}
        ref_state = jax.jit(model.step_fn(dt, 3))(state)
        out, series = resident_step_fn(model, dt, n_steps=3,
                                       interpret=True,
                                       diagnostics=diag)(state)
        assert series["mass"].shape == (3,)
        np.testing.assert_allclose(np.asarray(out.h),
                                   np.asarray(ref_state.h),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(float(series["mass"][-1]),
                                   float(jnp.sum(ref_state.h)), rtol=1e-12)

    def test_resident_stepper_drives_simulation(self, tmp_path):
        """Simulation(stepper=ResidentStepper(...)) — the cli --fused
        small-grid path (r4) — matches the XLA run, final state AND
        in-graph scalar series."""
        from swmhd_tpu.ops.fused_step import ResidentStepper
        from swmhd_tpu import Simulation, IterationInterval, diagnostics
        from swmhd_tpu.io import ScalarSeriesWriter

        model, state = build(VECTOR_INVARIANT, N=64)
        h0 = state.h

        def run(stepper, out):
            sim = Simulation(model, dt=0.01, stop_iteration=5,
                             stepper=stepper)
            sim.output_writers["energies"] = ScalarSeriesWriter(
                fn=lambda m, s: {"te": diagnostics.energy_report(m, s, h0)
                                 ["total_energy"]},
                schedule=IterationInterval(1), path=str(out))
            return sim.run(state)

        ref = run(None, tmp_path / "ref.csv")
        res = run(ResidentStepper(model, interpret=True),
                  tmp_path / "res.csv")
        for name in ("h", "u", "v", "A"):
            np.testing.assert_allclose(
                np.asarray(getattr(res, name)),
                np.asarray(getattr(ref, name)),
                rtol=1e-12, atol=1e-12, err_msg=name)
        a = np.loadtxt(tmp_path / "ref.csv", delimiter=",", skiprows=1)
        b = np.loadtxt(tmp_path / "res.csv", delimiter=",", skiprows=1)
        np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-12)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU resident==XLA equality")
def test_resident_matches_xla_on_tpu():
    """Compiled (Mosaic) agreement of the resident multi-step kernel at
    512² f32 over 10 steps — the bench-ladder path for small grids."""
    from swmhd_tpu.ops.fused_step import resident_step_fn
    g = Grid.regular(512, 512, (-L / 2, L / 2), (-L / 2, L / 2),
                     dtype=jnp.float32)
    model = ShallowWaterModel(grid=g, formulation=VECTOR_INVARIANT,
                              coriolis=FPlane(1.0),
                              forcing=jacobian_lorentz_forcing())
    state = model.initial_state(
        u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
        h=lambda x, y: 1.0 + 0.05 * jnp.exp(-(x**2 + y**2)),
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
        - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))
    dt = 0.002
    ref = jax.jit(model.step_fn(dt, 10))(state)
    out = jax.jit(resident_step_fn(model, dt, n_steps=10))(state)
    for name in ("h", "u", "v", "A"):
        a = np.asarray(getattr(out, name), dtype=np.float64)
        b = np.asarray(getattr(ref, name), dtype=np.float64)
        scale = np.max(np.abs(b)) + 1e-30
        assert np.max(np.abs(a - b)) / scale < 2e-5, (
            f"{name}: resident deviates from XLA on TPU by "
            f"{np.max(np.abs(a - b)) / scale:.2e}")


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU 128² path-equality (VERDICT r4 item 1)")
@pytest.mark.parametrize("scenario", ["two_Gaussians_low_B", "low_B_low_U"])
def test_resident_windowed_xla_agree_at_128_on_tpu(scenario):
    """The CLI ships the RESIDENT kernel at 128² (cli.select_stepper);
    pin resident == windowed == XLA over 10 compiled steps at 128² f32
    for BOTH shipped topologies (periodic-periodic two_Gaussians and
    bounded-y low_B_low_U) — closes the r4 validation seam where the
    128² hardware record ran a different kernel than the CLI ships."""
    from swmhd_tpu import scenarios
    from swmhd_tpu.ops.fused_step import resident_step_fn
    model, state, sc = scenarios.build(f"128x128_{scenario}",
                                       VECTOR_INVARIANT,
                                       dtype=jnp.float32)
    dt = sc.dt
    ref = jax.jit(model.step_fn(dt, 10))(state)
    win = jax.jit(fused_step_fn(model, dt, n_steps=10))(state)
    res = jax.jit(resident_step_fn(model, dt, n_steps=10))(state)
    # Normalize by the STATE-wide scale (~h's O(1)), not per-field: the
    # rest-start scenarios have max|u| ~ 1e-3 after 10 steps, where a
    # per-field relative bound would demand sub-roundoff agreement of
    # f32 kernels (the coupled system's roundoff lives at the state
    # scale, not each field's own).
    state_scale = max(
        float(np.max(np.abs(np.asarray(getattr(ref, n), np.float64))))
        for n in ("h", "u", "v", "A"))
    for out, tag in ((win, "windowed"), (res, "resident")):
        for name in ("h", "u", "v", "A"):
            a = np.asarray(getattr(out, name), dtype=np.float64)
            b = np.asarray(getattr(ref, name), dtype=np.float64)
            assert np.max(np.abs(a - b)) / state_scale < 2e-5, (
                f"{scenario}/{name}: {tag} deviates from XLA on TPU by "
                f"{np.max(np.abs(a - b)) / state_scale:.2e}")
    # resident vs windowed run the identical tendency arithmetic with
    # different roll/DMA structure — pin them to each other too
    for name in ("h", "u", "v", "A"):
        a = np.asarray(getattr(res, name), dtype=np.float64)
        b = np.asarray(getattr(win, name), dtype=np.float64)
        assert np.max(np.abs(a - b)) / state_scale < 2e-5, (
            f"{scenario}/{name}: resident vs windowed differ by "
            f"{np.max(np.abs(a - b)) / state_scale:.2e}")


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU 64² resident==XLA equality (r5)")
@pytest.mark.parametrize("scenario", ["two_Gaussians_low_B",
                                      "low_B_low_U"])
def test_resident_matches_xla_at_64_on_tpu(scenario):
    """r5 relaxed the resident kernel's lane-alignment guard (no manual
    HBM window DMAs -> Mosaic handles 64-lane arrays), so the CLI now
    ships the resident kernel at 64² too — pin it against XLA over 10
    compiled steps for both shipped topologies."""
    from swmhd_tpu import scenarios
    from swmhd_tpu.ops.fused_step import resident_step_fn
    model, state, sc = scenarios.build(f"64x64_{scenario}",
                                       VECTOR_INVARIANT,
                                       dtype=jnp.float32)
    ref = jax.jit(model.step_fn(sc.dt, 10))(state)
    res = jax.jit(resident_step_fn(model, sc.dt, n_steps=10))(state)
    state_scale = max(
        float(np.max(np.abs(np.asarray(getattr(ref, n), np.float64))))
        for n in ("h", "u", "v", "A"))
    for name in ("h", "u", "v", "A"):
        a = np.asarray(getattr(res, name), dtype=np.float64)
        b = np.asarray(getattr(ref, name), dtype=np.float64)
        assert np.max(np.abs(a - b)) / state_scale < 2e-5, (
            f"64²/{scenario}/{name}: resident deviates from XLA by "
            f"{np.max(np.abs(a - b)) / state_scale:.2e}")
