"""Host-side matplotlib rendering of poses, predictions, and diffusion chains.

Re-implementation of the reference's visualisation capabilities
(visualization_ani.py:71-338 animations; visualization_fig.py:35-125 static
figures): 2D keypoint animations, side-by-side GT vs reconstruction 3D
animations with per-frame MPJPE titles, forward/reverse diffusion chain
animations, and static snapshots of the reverse chain.

Animations are written with the Pillow GIF writer (this image has no
ffmpeg); pass ``writer='ffmpeg'`` for mp4 where available. All functions
take plain numpy arrays so the render layer has no model dependencies.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _import_mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _skeleton_lines(ax, pose, parents, joints_right, lw=2, dim=3, colors=("black", "red")):
    """Draw one pose (J, 2|3) as parent->child line segments."""
    artists = []
    for j, parent in enumerate(parents):
        if parent == -1:
            continue
        col = colors[1] if j in joints_right else colors[0]
        xs = [pose[j, 0], pose[parent, 0]]
        ys = [pose[j, 1], pose[parent, 1]]
        if dim == 3:
            zs = [pose[j, 2], pose[parent, 2]]
            (ln,) = ax.plot(xs, ys, zs, zdir="z", c=col, lw=lw)
        else:
            (ln,) = ax.plot(xs, ys, c=col, lw=lw)
        artists.append(ln)
    return artists


def _setup_3d_axis(ax, radius, title=None):
    ax.set_xlim3d([-radius / 2, radius / 2])
    ax.set_zlim3d([0, radius])
    ax.set_ylim3d([-radius / 2, radius / 2])
    try:
        ax.set_aspect("equal")
    except NotImplementedError:
        ax.set_aspect("auto")
    ax.view_init(elev=15.0, azim=70)
    ax.set_xticklabels([])
    ax.set_yticklabels([])
    ax.set_zticklabels([])
    ax.dist = 7.5
    if title:
        ax.set_title(title)


def render_2d_animation(
    keypoints: np.ndarray,
    parents: Sequence[int],
    joints_right: Sequence[int],
    out_path: str,
    fps: int = 25,
    limit: Optional[int] = None,
):
    """Animate 2D keypoints [F, J, 2] (pixel coordinates)."""
    plt = _import_mpl()
    from matplotlib.animation import FuncAnimation

    frames = keypoints.shape[0] if limit is None else min(limit, keypoints.shape[0])
    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(1, 1, 1)
    ax.set_xlim(keypoints[..., 0].min(), keypoints[..., 0].max())
    ax.set_ylim(keypoints[..., 1].max(), keypoints[..., 1].min())  # image coords: y down
    ax.axis("off")

    state = {"artists": []}

    def update(i):
        for a in state["artists"]:
            a.remove()
        state["artists"] = _skeleton_lines(ax, keypoints[i], parents, joints_right, dim=2)
        return state["artists"]

    anim = FuncAnimation(fig, update, frames=frames, interval=1000 / fps, blit=False)
    anim.save(out_path, writer="pillow", fps=fps)
    plt.close(fig)
    return out_path


def render_3d_animation(
    gt: Optional[np.ndarray],
    prediction: np.ndarray,
    parents: Sequence[int],
    joints_right: Sequence[int],
    out_path: str,
    fps: int = 25,
    limit: Optional[int] = None,
    radius: float = 1.7,
    azim: float = 70.0,
):
    """Side-by-side GT vs reconstruction animation ([F, J, 3] world space)
    with per-frame MPJPE in the prediction panel title when GT is given."""
    plt = _import_mpl()
    from matplotlib.animation import FuncAnimation

    frames = prediction.shape[0] if limit is None else min(limit, prediction.shape[0])
    panels = [("Reconstruction", prediction)]
    if gt is not None:
        panels.insert(0, ("Ground truth", gt))

    fig = plt.figure(figsize=(4 * len(panels), 4))
    axes = []
    for i, (title, _) in enumerate(panels):
        ax = fig.add_subplot(1, len(panels), i + 1, projection="3d")
        _setup_3d_axis(ax, radius, title)
        ax.view_init(elev=15.0, azim=azim)
        axes.append(ax)

    state = {"artists": []}

    def update(i):
        for a in state["artists"]:
            a.remove()
        state["artists"] = []
        for ax, (title, data) in zip(axes, panels):
            pose = data[i] - data[i, :1] + np.array([0, 0, radius / 2])
            state["artists"] += _skeleton_lines(ax, pose, parents, joints_right, dim=3)
        if gt is not None:
            err = np.mean(np.linalg.norm(prediction[i] - gt[i], axis=-1)) * 1000
            axes[-1].set_title(f"Reconstruction ({err:.1f} mm)")
        return state["artists"]

    anim = FuncAnimation(fig, update, frames=frames, interval=1000 / fps, blit=False)
    anim.save(out_path, writer="pillow", fps=fps)
    plt.close(fig)
    return out_path


def render_chain_animation(
    chain: np.ndarray,
    parents: Sequence[int],
    joints_right: Sequence[int],
    out_path: str,
    frame_index: int = 0,
    fps: int = 4,
    radius: float = 1.7,
    titles: Optional[Sequence[str]] = None,
):
    """Animate a diffusion chain [F, J, 3, num_steps] for one frame index:
    each animation step is one diffusion step (forward chain from
    get_noisy_pose or reverse chain from ddim collect_chain)."""
    plt = _import_mpl()
    from matplotlib.animation import FuncAnimation

    steps = chain.shape[-1]
    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(1, 1, 1, projection="3d")
    _setup_3d_axis(ax, radius)

    state = {"artists": []}

    def update(s):
        for a in state["artists"]:
            a.remove()
        pose = chain[frame_index, :, :, s]
        pose = pose - pose[:1] + np.array([0, 0, radius / 2])
        state["artists"] = _skeleton_lines(ax, pose, parents, joints_right, dim=3)
        ax.set_title(titles[s] if titles else f"step {s}")
        return state["artists"]

    anim = FuncAnimation(fig, update, frames=steps, interval=1000 / fps, blit=False)
    anim.save(out_path, writer="pillow", fps=fps)
    plt.close(fig)
    return out_path


def render_2d_figs(
    keypoints: np.ndarray,
    parents: Sequence[int],
    joints_right: Sequence[int],
    out_path: str,
    frame_indices: Sequence[int],
):
    """Static multi-panel 2D keypoint snapshots (reference render_2d_figs)."""
    plt = _import_mpl()

    n = len(frame_indices)
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 3))
    axes = np.atleast_1d(axes)
    for ax, i in zip(axes, frame_indices):
        ax.set_xlim(keypoints[..., 0].min(), keypoints[..., 0].max())
        ax.set_ylim(keypoints[..., 1].max(), keypoints[..., 1].min())
        ax.axis("off")
        _skeleton_lines(ax, keypoints[i], parents, joints_right, dim=2)
        ax.set_title(f"frame {i}")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def render_3d_figs(
    poses: np.ndarray,
    parents: Sequence[int],
    joints_right: Sequence[int],
    out_path: str,
    step_indices: Sequence[int],
    frame_index: int = 0,
    radius: float = 1.7,
    titles: Optional[Sequence[str]] = None,
):
    """Static snapshots of a diffusion chain [F, J, 3, S] at chosen steps
    (reference render_3d_figs: start/middle/end of the reverse chain)."""
    plt = _import_mpl()

    n = len(step_indices)
    fig = plt.figure(figsize=(3 * n, 3))
    for k, s in enumerate(step_indices):
        ax = fig.add_subplot(1, n, k + 1, projection="3d")
        _setup_3d_axis(ax, radius, titles[k] if titles else f"step {s}")
        pose = poses[frame_index, :, :, s]
        pose = pose - pose[:1] + np.array([0, 0, radius / 2])
        _skeleton_lines(ax, pose, parents, joints_right, dim=3)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path
