"""Visualization/eval suite — matplotlib/ffmpeg rebuild of `src/plotting.jl`.

  * plot_heat     — space-time heatmaps of field, forcing, reward
                    (plotting.jl:4-169)
  * plot_sensors  — sensor/actuator kernel shapes (plotting.jl:171-186)
  * plot_sums     — sum(|y|), sum(|p|) time series (plotting.jl:188-249)
  * plot_actions  — per-actuator action traces (plotting.jl:251-304)
  * plot_rewards  — reward landscape over a (y, action) grid
                    (plotting.jl:526-541)
  * render_animation — frame dump + ffmpeg mp4 (plotrun, plotting.jl:306-521)
  * plot_energy   — fluid energy traces vs baselines (testrun eval)

All functions take host-side traces (from train.eval.rollout or
hook.best_trace) and return the matplotlib Figure; pass `path` to save.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _finish(fig, path: Optional[str]):
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def _as_real_field(y: np.ndarray) -> np.ndarray:
    """Spectral (complex) traces -> real space; real traces pass through."""
    if np.iscomplexobj(y):
        return np.fft.ifft2(y, axes=(-2, -1)).real
    return y


def plot_heat(traces: dict, path: Optional[str] = None, from_step: int = 0,
              to_step: Optional[int] = None, title: str = "",
              plot_separate: bool = False):
    """Space-time heatmaps of y(x,t), forcing p(x,t) and reward(t) for 1D
    fields; the plot_heat panel layout of plotting.jl:146-158.

    `from_step`/`to_step` window the trace (the reference's `from`/`to`
    kwargs, plotting.jl:4); `plot_separate=True` writes each panel as its
    own figure `<stem>_{y,p,reward}.png` (plot_separate, plotting.jl:4)."""
    y = np.asarray(traces["y"])[from_step:to_step]
    p = np.asarray(traces["forcing"])[from_step:to_step]
    r = np.asarray(traces["reward"])[from_step:to_step]
    if y.ndim == 3 and y.shape[1] == 2:  # Keller-Segel two-field: plot u
        y = y[:, 0]
        p = p if p.ndim == 2 else p
    if plot_separate:
        import os

        stem, ext = (os.path.splitext(path) if path else ("heat", ".png"))
        outs = []
        for arr, name, cmap in ((y, "y", "RdBu_r"), (p, "p", "PiYG"),
                                (r, "reward", "viridis")):
            fig, ax = plt.subplots(figsize=(10, 4))
            im = ax.imshow(arr.T, aspect="auto", origin="lower", cmap=cmap,
                           interpolation="nearest")
            ax.set_xlabel("step")
            ax.set_ylabel("x" if name != "reward" else "actuator")
            ax.set_title(f"{name} {title}")
            fig.colorbar(im, ax=ax)
            outs.append(_finish(fig, f"{stem}_{name}{ext}" if path else None))
        return outs
    fig, axes = plt.subplots(3, 1, figsize=(10, 9), sharex=True)
    im0 = axes[0].imshow(y.T, aspect="auto", origin="lower", cmap="RdBu_r",
                         interpolation="nearest")
    axes[0].set_ylabel("x")
    axes[0].set_title(f"field y {title}")
    fig.colorbar(im0, ax=axes[0])
    im1 = axes[1].imshow(p.T, aspect="auto", origin="lower", cmap="PiYG",
                         interpolation="nearest")
    axes[1].set_ylabel("x")
    axes[1].set_title("forcing p")
    fig.colorbar(im1, ax=axes[1])
    im2 = axes[2].imshow(r.T, aspect="auto", origin="lower", cmap="viridis",
                         interpolation="nearest")
    axes[2].set_ylabel("actuator")
    axes[2].set_xlabel("step")
    axes[2].set_title("reward")
    fig.colorbar(im2, ax=axes[2])
    return _finish(fig, path)


def plot_sensors(kernels: np.ndarray, path: Optional[str] = None):
    """Kernel shapes (plotting.jl:171-186)."""
    kernels = np.asarray(kernels)
    fig, ax = plt.subplots(figsize=(9, 4))
    if kernels.ndim == 2:
        for i, k in enumerate(kernels):
            ax.plot(k, lw=1, label=f"k{i}" if len(kernels) <= 12 else None)
        if len(kernels) <= 12:
            ax.legend()
    else:  # 2D kernels: show the union
        ax.imshow(kernels.sum(axis=0), cmap="magma")
    ax.set_title("sensor/actuator kernels")
    return _finish(fig, path)


def plot_sums(traces: dict, path: Optional[str] = None):
    """sum(|y|) and sum(|p|) vs time (plotting.jl:188-249)."""
    y = _as_real_field(np.asarray(traces["y"]))
    p = np.asarray(traces["forcing"])
    if np.iscomplexobj(p):
        p = np.fft.ifft2(p, axes=(-2, -1)).real
    t = np.asarray(traces.get("time", np.arange(len(y))))
    fig, ax = plt.subplots(figsize=(9, 4))
    ax.plot(t, np.abs(y.reshape(len(y), -1)).sum(axis=1), label="sum |y|")
    ax.plot(t, np.abs(p.reshape(len(p), -1)).sum(axis=1), label="sum |p|")
    ax.set_xlabel("t")
    ax.legend()
    ax.set_title("field and forcing magnitude")
    return _finish(fig, path)


def plot_actions(traces: dict, path: Optional[str] = None, max_actuators: int = 16):
    """Per-actuator action traces (plotting.jl:251-304)."""
    a = np.asarray(traces["action"])  # (steps, rows, n_act)
    a = a[:, 0, :] if a.ndim == 3 else a
    fig, ax = plt.subplots(figsize=(9, 4))
    for i in range(min(a.shape[1], max_actuators)):
        ax.plot(a[:, i], lw=0.8)
    ax.set_xlabel("step")
    ax.set_ylabel("action")
    ax.set_title(f"actions (first {min(a.shape[1], max_actuators)} actuators)")
    return _finish(fig, path)


def plot_rewards_curve(rewards: Sequence[float], path: Optional[str] = None,
                       bestepisode: Optional[int] = None):
    """Training reward curve (the hook's terminal plot, PDEhook.jl:100-102)."""
    fig, ax = plt.subplots(figsize=(9, 4))
    ax.plot(np.asarray(rewards))
    if bestepisode:
        ax.axvline(bestepisode - 1, color="r", ls="--", lw=0.8, label="best")
        ax.legend()
    ax.set_xlabel("episode")
    ax.set_ylabel("total reward")
    ax.set_title("reward per episode")
    return _finish(fig, path)


def plot_reward_landscape(reward_fn, y_range, a_range, n: int = 101,
                          path: Optional[str] = None):
    """Reward over a (y, action) grid (plot_rewards, plotting.jl:526-541).

    `reward_fn(y_scalar, a_scalar) -> float` is setup-specific.
    """
    ys = np.linspace(*y_range, n)
    As = np.linspace(*a_range, n)
    Z = np.asarray([[float(reward_fn(y, a)) for a in As] for y in ys])
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(Z, origin="lower", aspect="auto",
                   extent=[a_range[0], a_range[1], y_range[0], y_range[1]], cmap="viridis")
    ax.set_xlabel("action")
    ax.set_ylabel("y")
    fig.colorbar(im, ax=ax)
    ax.set_title("reward landscape")
    return _finish(fig, path)


def plot_energy(energies: dict, path: Optional[str] = None):
    """Fluid energy traces: trained vs baselines (testrun eval,
    FluidSetup.jl:497-500 + Fluid_8.jl:28)."""
    fig, ax = plt.subplots(figsize=(9, 4))
    for label, e in energies.items():
        ax.plot(np.asarray(e), label=label)
    ax.set_xlabel("step")
    ax.set_ylabel("sum |omega| / (nx*ny)")
    ax.legend()
    ax.set_title("energy")
    return _finish(fig, path)


def render_animation(traces: dict, out_dir: str, fps: int = 16,
                     filename: str = "output.mp4") -> Optional[str]:
    """Frame dump + ffmpeg assembly (plotrun/testrun video path,
    plotting.jl:486-510, FluidSetup.jl:533-536). Returns the mp4 path, or
    None if ffmpeg is unavailable (frames are still written)."""
    frames_dir = os.path.join(out_dir, "frames")
    os.makedirs(frames_dir, exist_ok=True)
    y = _as_real_field(np.asarray(traces["y"]))
    vmax = np.abs(y).max() or 1.0
    for i, frame in enumerate(y):
        fig, ax = plt.subplots(figsize=(6, 5))
        if frame.ndim == 1:
            ax.plot(frame)
            ax.set_ylim(-vmax, vmax)
        else:
            ax.imshow(frame, cmap="RdBu_r", vmin=-vmax, vmax=vmax)
        ax.set_title(f"step {i}")
        fig.savefig(os.path.join(frames_dir, f"a{i:04d}.png"), dpi=80)
        plt.close(fig)
    if shutil.which("ffmpeg") is None:
        return None
    out_path = os.path.join(out_dir, filename)
    subprocess.run(
        ["ffmpeg", "-y", "-framerate", str(fps), "-i",
         os.path.join(frames_dir, "a%04d.png"), "-c:v", "libx264", "-crf", "21",
         "-an", "-pix_fmt", "yuv420p", out_path],
        check=True, capture_output=True,
    )
    return out_path


def plot_waterfall(traces: dict, path: Optional[str] = None, stride: int = 10,
                   max_lines: int = 60):
    """3D waterfall of a 1D field's evolution — the `plotrun(plot3D=true)`
    view (plotting.jl:306-521)."""
    from mpl_toolkits.mplot3d import Axes3D  # noqa: F401

    y = _as_real_field(np.asarray(traces["y"]))
    if y.ndim == 3 and y.shape[1] == 2:
        y = y[:, 0]
    idx = np.arange(0, len(y), stride)[:max_lines]
    fig = plt.figure(figsize=(9, 6))
    ax = fig.add_subplot(projection="3d")
    x = np.arange(y.shape[-1])
    for rank, i in enumerate(idx):
        ax.plot(x, np.full_like(x, float(i), dtype=float), y[i], lw=0.8,
                color=plt.cm.viridis(rank / max(len(idx) - 1, 1)))
    ax.set_xlabel("x")
    ax.set_ylabel("step")
    ax.set_zlabel("y")
    ax.set_title("field evolution")
    return _finish(fig, path)
