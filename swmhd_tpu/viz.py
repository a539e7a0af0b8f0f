"""Post-processing visualisation — the Makie movie + energy-plot analog.

Reproduces the layout of the reference's artifacts: a two-panel
(A, speed) animation (SWMHD_example.jl:118-130, saved as the
simulation_runs/*.mp4 baselines) and the 4-panel energy figure
(kinetic / magnetic / potential / total-energy deviation,
SWMHD_example.jl:149-165, the energy_plots/*.png baselines).

matplotlib only; the movie is written as an .mp4 when ffmpeg is available,
otherwise as a directory of .png frames.
"""

from __future__ import annotations

import os

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def render_energy_plot(energies_csv: str, out_png: str, title: str = ""):
    from .io.readers import ScalarTimeSeries
    plt = _mpl()
    ts = ScalarTimeSeries(energies_csv)
    t = ts.time
    dev = np.abs(ts.total_energy - ts.total_energy[0]) * 100.0

    fig, axes = plt.subplots(2, 2, figsize=(10, 7))
    panels = [
        ("kinetic energy", ts.kinetic_energy, "red"),
        ("magnetic energy", ts.magnetic_energy, "blue"),
        ("potential energy", ts.potential_energy, "green"),
        ("total energy deviation (abs × 100)", dev, "black"),
    ]
    for ax, (name, series, color) in zip(axes.flat, panels):
        ax.plot(t, series, color=color, linewidth=2)
        ax.set_title(name)
        ax.set_xlabel("t")
    if title:
        fig.suptitle(f"{title}: Energy Plots")
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


def render_movie(fields_dir: str, out_path: str, names=("A", "s"),
                 titles=("Magnetic potential", "Speed"), fps: int = 24,
                 autoscale: bool = False, figsize=None, cmap="viridis"):
    from .io.readers import FieldTimeSeries
    plt = _mpl()
    series = [FieldTimeSeries(fields_dir, n) for n in names]
    times = series[0].times
    gm = series[0].grid_meta or {}
    extent = None
    if gm:
        extent = (gm["x0"], gm["x0"] + gm["Lx"], gm["y0"], gm["y0"] + gm["Ly"])

    vmins = [min(float(s[i].min()) for i in range(len(s))) for s in series]
    vmaxs = [max(float(s[i].max()) for i in range(len(s))) for s in series]

    if figsize is None:
        figsize = (6 * len(series), 5)
    frames_dir = out_path + ".frames"
    os.makedirs(frames_dir, exist_ok=True)
    for i in range(len(times)):
        fig, axes = plt.subplots(1, len(series), figsize=figsize)
        if len(series) == 1:
            axes = [axes]
        for ax, s, ttl, vmin, vmax in zip(axes, series, titles, vmins, vmaxs):
            frame = np.asarray(s[i])
            if autoscale:  # the reference's Makie movies recolor per frame
                vmin, vmax = float(frame.min()), float(frame.max())
                if vmax <= vmin:
                    vmax = vmin + 1e-12
            im = ax.imshow(frame.T, origin="lower",
                           extent=extent, cmap=cmap,
                           vmin=vmin, vmax=vmax)
            ax.set_title(f"{ttl} at time = {times[i]:.1f}")
            ax.set_xlabel("x")
            ax.set_ylabel("y")
            fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(os.path.join(frames_dir, f"{i:05d}.png"), dpi=100)
        plt.close(fig)

    # encode: ffmpeg if present, else OpenCV's mp4 writer, else keep frames
    import shutil, subprocess
    if shutil.which("ffmpeg"):
        subprocess.run(
            ["ffmpeg", "-y", "-loglevel", "error", "-framerate", str(fps),
             "-i", os.path.join(frames_dir, "%05d.png"),
             "-pix_fmt", "yuv420p", out_path],
            check=True)
        shutil.rmtree(frames_dir)
        return out_path
    try:
        import cv2
    except ImportError:
        return frames_dir
    frame_files = sorted(os.listdir(frames_dir))
    first = cv2.imread(os.path.join(frames_dir, frame_files[0]))
    h_px, w_px = first.shape[:2]
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w_px, h_px))
    if not writer.isOpened():
        return frames_dir
    for f in frame_files:
        writer.write(cv2.imread(os.path.join(frames_dir, f)))
    writer.release()
    shutil.rmtree(frames_dir)
    return out_path


def render_field_verification(grid, A, h, out_prefix: str,
                              subsample: int = 4):
    """A-contour + quiver figures of the magnetic field and the
    jacobian-form Lorentz force — the analog of the reference's
    `A_and_magnetic_field.png` / `A_and_lorentz_force.png`
    (MHD_visualize.jl:79-98). Returns the two written paths."""
    import jax.numpy as jnp
    from .physics.lorentz import magnetic_field_cc, lorentz_force_jacobian
    from . import operators as op_mod
    plt = _mpl()

    Xc, Yc = (np.asarray(a) for a in grid.nodes("cc"))
    Bx, By = (np.asarray(a) for a in magnetic_field_cc(A, h, grid))
    fu, fv = lorentz_force_jacobian(A, h, grid)
    # interpolate face-located forces to centers for plotting
    fu_c = np.asarray(op_mod.ix_c(fu, grid))
    fv_c = np.asarray(op_mod.iy_c(fv, grid))
    A_np = np.asarray(A)
    s = slice(None, None, subsample)

    made = []
    for tag, (U, V), title in (
            ("magnetic_field", (Bx, By), "A and magnetic field"),
            ("lorentz_force", (fu_c, fv_c), "A and Lorentz force")):
        fig, ax = plt.subplots(figsize=(7, 6))
        cs = ax.contourf(Xc, Yc, A_np, levels=20, cmap="viridis")
        ax.quiver(Xc[s, s], Yc[s, s], U[s, s], V[s, s], color="white")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        ax.set_title(title)
        fig.colorbar(cs, ax=ax, label="A")
        path = f"{out_prefix}_{tag}.png"
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        made.append(path)
    return made


def render_scenario_outputs(outdir: str, title: str = ""):
    """Render the full reference-artifact set for a CLI run directory."""
    made = []
    energies = os.path.join(outdir, "energies.csv")
    if os.path.exists(energies):
        made.append(render_energy_plot(
            energies, os.path.join(outdir, "energy_plot.png"), title))
    fields = os.path.join(outdir, "fields")
    if os.path.isdir(fields):
        made.append(render_movie(fields, os.path.join(outdir, "movie.mp4")))
    return made
