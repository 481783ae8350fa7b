"""Trajectory rendering — the RecordVideo equivalent.

The reference records Isaac Sim videos through gym.wrappers.RecordVideo
(orbit/wrappers/torchrl.py:117-123, cfg env.video* keys). Without a renderer,
this module draws the scene state (bodies as markers, object mesh points,
particles, targets) with matplotlib and writes an animated GIF / MP4 per
episode — enough to inspect learned behavior offline.

    from geometry_rl_tpu.train.render import record_rollout
    record_rollout(trainer, state, "episode.gif", n_steps=100, env_index=0)
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np


def _collect_frames(trainer, state, n_steps: int, env_index: int, deterministic: bool = True):
    """Roll the policy and snapshot scene states for one env."""
    from ..rl import gaussian as G
    from ..rl.obs_pipeline import obs_norm_step

    env = trainer.env
    key = jax.random.fold_in(state.key, 1234)
    env_state = env.reset(key)
    obs = env.observe(env_state)
    frames = []
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        _, tobs = obs_norm_step(state.norm, obs, update=False)
        dist = trainer._policy_dist(state.actor_params, tobs)
        action = dist.mean if deterministic else G.sample(k, dist)
        env_state, ts = env.step(env_state, action)
        obs = ts.obs
        if bool(ts.done[env_index]):
            # the env auto-resets inside step: the post-done scene belongs to
            # the NEXT episode, so stop recording at episode end
            break
        scene = env_state.scene
        frame = {
            "bodies": np.asarray(scene.bodies.pos[env_index]),
        }
        if "object_target_distance" in ts.info:
            frame["task_distance"] = float(ts.info["object_target_distance"][env_index])
        if hasattr(env.cfg, "target_body"):
            frame["target"] = np.asarray(scene.bodies.pos[env_index, env.cfg.target_body])
        if hasattr(env_state, "hanger_pos"):  # cloth: capsule hook along +y
            h = np.asarray(env_state.hanger_pos[env_index])
            L = getattr(env.cfg, "hanger_half_len", 0.5) * 2
            frame["hook"] = np.stack([h, h + np.array([0.0, L, 0.0])])
        elif hasattr(env_state, "hanger_xy"):  # rope: vertical pole
            hxy = np.asarray(env_state.hanger_xy[env_index])
            frame["hook"] = np.stack(
                [np.array([hxy[0], hxy[1], 0.0]), np.array([hxy[0], hxy[1], 1.0])]
            )
        if scene.particles is not None:
            frame["particles"] = np.asarray(scene.particles.pos[env_index])
        if hasattr(env, "obj_points"):
            from ..utils.math import transform_points

            obj = env.cfg.object_body
            pts = transform_points(
                env.obj_points[env_index : env_index + 1],
                scene.bodies.pos[env_index : env_index + 1, obj],
                scene.bodies.quat[env_index : env_index + 1, obj],
            )
            frame["mesh"] = np.asarray(pts[0])
            frame["mesh_mask"] = np.asarray(env.obj_point_mask[env_index]) > 0.5
        frames.append(frame)
    return frames


def record_rollout(
    trainer,
    state,
    path: str,
    n_steps: int = 100,
    env_index: int = 0,
    deterministic: bool = True,
    fps: int = 25,
    elev: float = 25.0,
    azim: float = 45.0,
) -> str:
    """Render a policy rollout of one environment to a GIF/MP4 at `path`."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    frames = _collect_frames(trainer, state, n_steps, env_index, deterministic)

    # global bounds
    all_pts: List[np.ndarray] = []
    for f in frames:
        all_pts.append(f["bodies"])
        if "particles" in f:
            all_pts.append(f["particles"])
    pts = np.concatenate(all_pts, axis=0)
    lo, hi = pts.min(0) - 0.2, pts.max(0) + 0.2

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.view_init(elev=elev, azim=azim)

    def draw(i):
        ax.cla()
        f = frames[i]
        ax.scatter(*f["bodies"].T, c="tab:red", s=60, marker="s", label="bodies")
        if "target" in f:
            ax.scatter(*f["target"].T, c="tab:orange", s=120, marker="*", label="target")
        if "hook" in f:
            ax.plot(*f["hook"].T, c="tab:purple", lw=4, label="hook")
        if "mesh" in f:
            m = f["mesh"][f["mesh_mask"]]
            ax.scatter(*m.T, c="tab:blue", s=8, label="object mesh")
        if "particles" in f:
            p = f["particles"]
            ax.scatter(*p.T, c="tab:green", s=6, label="particles")
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_zlim(lo[2], hi[2])
        title = f"step {i}"
        if "task_distance" in f:
            title += f"  d={f['task_distance']:.3f}"
        ax.set_title(title)
        if i == 0:
            ax.legend(loc="upper right", fontsize=7)

    anim = animation.FuncAnimation(fig, draw, frames=len(frames), interval=1000 / fps)
    writer = animation.PillowWriter(fps=fps) if path.endswith(".gif") else animation.FFMpegWriter(fps=fps)
    anim.save(path, writer=writer)
    plt.close(fig)
    return path
